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
