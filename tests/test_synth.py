import numpy as np
import pyarrow as pa

from rayrl import synth
from rayrl.schema import PAGES


def test_batch_deterministic_and_partition_independent():
    whole = synth.make_pages_batch(np.arange(500))
    again = synth.make_pages_batch(np.arange(500))
    assert whole.equals(again)
    parts = pa.concat_tables(
        [synth.make_pages_batch(np.arange(0, 123)), synth.make_pages_batch(np.arange(123, 500))]
    )
    assert parts.combine_chunks().equals(whole.combine_chunks())


def test_schema_matches_input_hint():
    t = synth.make_pages_batch(np.arange(10))
    assert t.schema.equals(PAGES)
    assert t.column("html")[0].as_py() == b"<html>" + t.column("text")[0].as_py().encode() + b"</html>"


def test_entity_cluster_sizes():
    ids = np.arange(50_000, dtype=np.int64)
    ent = synth.entity_ids(ids)
    _, counts = np.unique(ent, return_counts=True)
    assert counts.min() >= 1 and counts.max() <= 5
    assert len(set(counts.tolist())) >= 4  # non-trivial size mix


def test_date_swap_eligibility_share():
    t = synth.make_pages_batch(np.arange(5000))
    days = t.column("warc_ts").to_pandas().dt.day
    assert (days < 13).mean() >= 0.5


def test_pages_dataset_streams(ray_session):
    ds = synth.pages_dataset(2000, override_num_blocks=4)
    assert ds.count() == 2000
    got = ds.take_batch(5, batch_format="pyarrow")
    assert set(got.column_names) == set(PAGES.names)
