"""Extension-dispatched reads (read_data, utils.R:331-343)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayrl.sources import read_any

ROWS = [
    {"record_id": 1, "host": "a.example", "n": 10},
    {"record_id": 2, "host": "b.example", "n": 20},
    {"record_id": 3, "host": "c.example", "n": 30},
]


@pytest.fixture(scope="module")
def drops(tmp_path_factory):
    d = tmp_path_factory.mktemp("drops")
    tbl = pa.Table.from_pylist(ROWS)
    pq.write_table(tbl, d / "t.parquet")
    with open(d / "t.csv", "w") as f:
        f.write("record_id,host,n\n")
        for r in ROWS:
            f.write(f"{r['record_id']},{r['host']},{r['n']}\n")
    with open(d / "t.tsv", "w") as f:
        f.write("record_id\thost\tn\n")
        for r in ROWS:
            f.write(f"{r['record_id']}\t{r['host']}\t{r['n']}\n")
    with open(d / "t.jsonl", "w") as f:
        for r in ROWS:
            f.write(json.dumps(r) + "\n")
    return str(d)


@pytest.mark.parametrize("name", ["t.parquet", "t.csv", "t.tsv", "t.jsonl"])
def test_read_any_same_rows_every_format(ray_session, drops, name):
    df = (
        read_any(os.path.join(drops, name))
        .to_pandas()
        .sort_values("record_id")
        .reset_index(drop=True)
    )
    assert df.to_dict("records") == ROWS


def test_read_any_column_pruning(ray_session, drops):
    for name in ("t.parquet", "t.csv", "t.jsonl"):
        df = read_any(os.path.join(drops, name), columns=["record_id", "n"]).to_pandas()
        assert sorted(df.columns) == ["n", "record_id"]
        assert df["n"].sum() == 60


def test_read_any_txt_lines_as_text_column(ray_session, drops):
    p = os.path.join(drops, "corpus.txt")
    with open(p, "w") as f:
        f.write("alpha line\nbeta line\ngamma line\n")
    from rayrl.sources import read_any

    df = read_any(p).to_pandas()
    assert list(df.columns) == ["text"]
    assert sorted(df["text"]) == ["alpha line", "beta line", "gamma line"]


def test_read_any_csv_in_tsv_named_directory(ray_session, drops):
    """A '.tsv' directory component must not flip a .csv file to tab
    parsing (basename-suffix detection)."""
    d = os.path.join(drops, "legacy.tsv")
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, "u.csv")
    with open(p, "w") as f:
        f.write("a,b\n1,2\n")
    from rayrl.sources import read_any

    df = read_any(p).to_pandas()
    assert sorted(df.columns) == ["a", "b"] and df["b"].iloc[0] == 2


def test_read_any_unknown_extension_raises(drops):
    with pytest.raises(ValueError, match="no reader"):
        read_any(os.path.join(drops, "t.xlsx"))


def test_read_any_directory_dispatches_by_members(ray_session, drops, tmp_path):
    """A directory dispatches on what's INSIDE it (r5 review: a CSV
    drop directory used to be routed blindly to read_parquet): CSV
    dirs parse as CSV, parquet dirs as parquet (metadata files
    ignored), and empty or mixed dirs raise read_any's own ValueError."""
    import shutil

    csv_dir = tmp_path / "csv_drop"
    csv_dir.mkdir()
    shutil.copy(os.path.join(drops, "t.csv"), csv_dir / "part-0.csv")
    df = read_any(str(csv_dir)).to_pandas().sort_values("record_id").reset_index(drop=True)
    assert list(df["record_id"]) == [1, 2, 3]

    pq_dir = tmp_path / "pq_drop"
    pq_dir.mkdir()
    shutil.copy(os.path.join(drops, "t.parquet"), pq_dir / "part-0.parquet")
    (pq_dir / "_SUCCESS").write_text("")  # metadata files must not confuse the sniff
    df = read_any(str(pq_dir), columns=["record_id"]).to_pandas()
    assert sorted(df["record_id"]) == [1, 2, 3] and list(df.columns) == ["record_id"]

    empty = tmp_path / "empty_drop"
    empty.mkdir()
    with pytest.raises(ValueError, match="no recognized data files"):
        read_any(str(empty))

    mixed = tmp_path / "mixed_drop"
    mixed.mkdir()
    shutil.copy(os.path.join(drops, "t.csv"), mixed / "a.csv")
    shutil.copy(os.path.join(drops, "t.parquet"), mixed / "b.parquet")
    with pytest.raises(ValueError, match="mixes"):
        read_any(str(mixed))
