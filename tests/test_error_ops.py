"""Per-operator property tests — the contracts table of FIXTURES.md F4
(the reference has no test suite; these pin the intended semantics of
each injector, SURVEY.md §5)."""

import collections

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from rayrl import assets, synth
from rayrl.errors import ErrorSpec, Injector
from rayrl.errors.injector import LEDGER_COL, _flatten_ledger
from rayrl.schema import DUP_UID_OFFSET, TWIN_UID_OFFSET

N = 4000
SEED = 7


@pytest.fixture(scope="module")
def clean():
    return synth.make_pages_batch(np.arange(N), seed=42)


def run(clean, *specs):
    out = Injector(list(specs), seed=SEED, asset_seed=42)(clean)
    ledger = _flatten_ledger(out).to_pandas()
    dirty = out.drop_columns([LEDGER_COL])
    return dirty, ledger


def by_id(table: pa.Table, col: str) -> dict:
    return dict(zip(table.column("row_uid").to_pylist(), table.column(col).to_pylist()))


def test_indel(clean):
    dirty, led = run(clean, ErrorSpec("indel", 0.2, ("text",)))
    assert len(led) > 0
    for _, r in led.iterrows():
        assert abs(len(r["after"]) - len(r["before"])) == 1


def test_repl_uniform_and_tables(clean):
    for table in ("uniform", "keyboard", "ocr", "phonetic"):
        dirty, led = run(clean, ErrorSpec("repl", 0.2, ("text",), {"table": table}))
        assert len(led) > 0, table
        for _, r in led.iterrows():
            b, a = r["before"], r["after"]
            assert len(a) == len(b)
            diff = [i for i in range(len(b)) if b[i] != a[i]]
            assert len(diff) == 1, (b, a)


def test_tpose(clean):
    dirty, led = run(clean, ErrorSpec("tpose", 0.2, ("text",)))
    assert len(led) > 0
    for _, r in led.iterrows():
        b, a = r["before"], r["after"]
        assert len(a) == len(b) and sorted(a) == sorted(b) and a != b
        diff = [i for i in range(len(b)) if b[i] != a[i]]
        assert len(diff) == 2 and diff[1] == diff[0] + 1
        assert b[diff[0]] == a[diff[1]] and b[diff[1]] == a[diff[0]]


def test_nicknames(clean):
    lookup = assets.nicknames(42)
    for op in ("real_to_nicknames", "nick_to_realnames", "invert_real_and_nicknames"):
        dirty, led = run(clean, ErrorSpec(op, 0.1, ("text",)))
        assert len(led) > 0, op
        for _, r in led.iterrows():
            bt, at = r["before"].split(" "), r["after"].split(" ")
            assert len(bt) == len(at)
            changed = [(x, y) for x, y in zip(bt, at) if x != y]
            assert len(changed) == 1
            old, new = changed[0]
            assert new in lookup[old]


def test_add_name_suffix(clean):
    dirty, led = run(clean, ErrorSpec("add_name_suffix", 0.1, ("text",)))
    assert len(led) > 0
    suffix_counts = collections.Counter()
    for _, r in led.iterrows():
        assert r["after"].startswith(r["before"] + " ")
        sfx = r["after"][len(r["before"]) + 1 :]
        assert sfx in assets.SUFFIXES
        suffix_counts[sfx] += 1
    assert suffix_counts.most_common(1)[0][0] == "jr"  # weight 300 dominates


def test_first_letter_abbreviate(clean):
    dirty, led = run(clean, ErrorSpec("first_letter_abbreviate", 0.3, ("lang",)))
    assert len(led) > 0
    for _, r in led.iterrows():
        assert r["after"] == r["before"][0]


def test_ch1_to_ch2_first_and_all(clean):
    dirty, led = run(clean, ErrorSpec("blanks_to_hyphens", 0.2, ("text",)))
    assert len(led) > 0
    for _, r in led.iterrows():
        assert r["after"].count("-") == r["before"].count("-") + 1
        assert r["after"].replace("-", " ") == r["before"].replace("-", " ")
    dirty, led = run(clean, ErrorSpec("ch1_to_ch2", 0.2, ("text",), {"ch1": " ", "ch2": "-", "all": True}))
    for _, r in led.iterrows():
        assert " " not in r["after"].strip() or r["after"].count(" ") < r["before"].count(" ")


def test_hyphens_to_blanks(clean):
    # ~10% of synth rows contain a hyphenated token
    dirty, led = run(clean, ErrorSpec("hyphens_to_blanks", 1.0, ("text",)))
    assert len(led) > 0
    for _, r in led.iterrows():
        assert r["before"].count("-") == r["after"].count("-") + 1


def test_make_missing_excludes_prior_errors(clean):
    dirty, led = run(
        clean,
        ErrorSpec("indel", 0.3, ("text",)),
        ErrorSpec("make_missing", 0.3, ("text",)),
    )
    miss = led[led["error"] == "make_missing"]
    prior = set(led[led["error"] == "indel"]["record_id"])
    assert len(miss) > 0
    assert miss["after"].isna().all()
    assert not (set(miss["record_id"]) & prior)  # anti-join vs ledger (R/4:110-118)


def test_swap_fields(clean):
    dirty, led = run(clean, ErrorSpec("swap_fields", 0.2, ("text", "lang")))
    assert len(led) > 0
    texts, langs = by_id(dirty, "text"), by_id(dirty, "lang")
    orig_t, orig_l = by_id(clean, "text"), by_id(clean, "lang")
    for _, r in led.iterrows():
        assert r["field"] == "text, lang"
        uid = r["record_id"]
        assert texts[uid] == orig_l[uid] and langs[uid] == orig_t[uid]


def test_married_name_change(clean):
    vocab, _ = assets.vocab(42)
    sex = assets.sex_of(42)
    dirty, led = run(clean, ErrorSpec("married_name_change", 0.2, ("text",)))
    assert len(led) > 0
    for _, r in led.iterrows():
        old_last = r["before"].rsplit(" ", 1)[-1]
        new_last = r["after"].rsplit(" ", 1)[-1]
        assert sex.get(old_last) == "f"  # reference gates on female rows (R/6:7-10)
        assert new_last in vocab


def test_add_duplicates_pristine(clean):
    dirty, led = run(
        clean,
        ErrorSpec("indel", 0.3, ("text",)),
        ErrorSpec("add_duplicates", 0.5, ("__dup__",)),
    )
    dups = led[led["error"] == "duplicate"]
    assert len(dups) > 0
    erred = set(led[led["error"] == "indel"]["record_id"])
    assert set(dups["record_id"]) <= erred  # only erred ids get duplicated (R/6:44-51)
    clean_by_id = {clean.column("row_uid")[i].as_py(): i for i in range(clean.num_rows)}
    d = dirty.to_pandas().set_index("row_uid")
    for rid in dups["record_id"]:
        row = d.loc[DUP_UID_OFFSET + rid]
        orig = clean.slice(clean_by_id[rid], 1).to_pandas().iloc[0]
        # appended row byte-equal to the clean original (R/6:53-56)
        assert row["text"] == orig["text"] and row["html"] == orig["html"]
        assert row["lang"] == orig["lang"] and row["warc_ts"] == orig["warc_ts"]


def test_twins(clean):
    dirty, led = run(clean, ErrorSpec("twins_generate", 0.1, ("text",)))
    twins = led[led["error"] == "twin"]
    assert len(twins) > 0
    d = dirty.to_pandas()
    for _, r in twins.iterrows():
        twin_id = int(f"123{r['record_id']}789")  # mangle rule (R/6:167)
        rows = d[d["record_id"] == twin_id]
        assert len(rows) == 1
        assert rows.iloc[0]["row_uid"] >= TWIN_UID_OFFSET
        bt, at = r["before"].split(" "), r["after"].split(" ")
        changed = [(x, y) for x, y in zip(bt, at) if x != y]
        assert len(changed) == 1
        old, new = changed[0]
        assert len(old) == len(new) and old[0] == new[0]  # same length + initial (R/6:138-150)


def test_date_swap(clean):
    dirty, led = run(clean, ErrorSpec("date_swap", 0.2, ("warc_ts",)))
    assert len(led) > 0
    for _, r in led.iterrows():
        b, a = pd.Timestamp(r["before"]), pd.Timestamp(r["after"])
        assert b.day < 13 and b.month != b.day  # eligibility (R/7:53)
        assert a.day == b.month and a.month == b.day and a.year == b.year
        assert a.time() == b.time()


def test_date_transpose_year(clean):
    dirty, led = run(clean, ErrorSpec("date_transpose", 0.2, ("warc_ts",), {"token": "year"}))
    assert len(led) > 0
    for _, r in led.iterrows():
        b, a = pd.Timestamp(r["before"]), pd.Timestamp(r["after"])
        yb, ya = str(b.year % 100).zfill(2), str(a.year % 100).zfill(2)
        assert yb[0] != yb[1] and ya == yb[::-1]
        assert (a.month, a.day) == (b.month, b.day)


def test_date_transpose_day(clean):
    dirty, led = run(clean, ErrorSpec("date_transpose", 0.3, ("warc_ts",), {"token": "day"}))
    assert len(led) > 0
    for _, r in led.iterrows():
        b, a = pd.Timestamp(r["before"]), pd.Timestamp(r["after"])
        assert str(a.day).zfill(2) == str(b.day).zfill(2)[::-1]
        assert (a.year, a.month) == (b.year, b.month)


def test_date_replace(clean):
    for token in ("year", "month", "day"):
        dirty, led = run(clean, ErrorSpec("date_replace", 0.2, ("warc_ts",), {"token": token}))
        assert len(led) > 0, token
        for _, r in led.iterrows():
            b, a = pd.Timestamp(r["before"]), pd.Timestamp(r["after"])
            changed = {
                "year": a.year != b.year and (a.month, a.day) == (b.month, b.day),
                "month": a.month != b.month and (a.year, a.day) == (b.year, b.day),
                "day": a.day != b.day and (a.year, a.month) == (b.year, b.month),
            }
            assert changed[token], (token, b, a)


def test_every_mutation_has_ledger_row_and_vice_versa(clean):
    specs = [
        ErrorSpec("indel", 0.1, ("text",)),
        ErrorSpec("repl", 0.1, ("text",)),
        ErrorSpec("make_missing", 0.05, ("lang",)),
        ErrorSpec("date_swap", 0.1, ("warc_ts",)),
    ]
    dirty, led = run(clean, *specs)
    d = dirty.to_pandas().set_index("row_uid")
    c = clean.to_pandas().set_index("row_uid")
    ledger_keys = set(zip(led["record_id"], led["field"]))
    for uid in c.index:
        for field in ("text", "lang"):
            same = (d.loc[uid, field] == c.loc[uid, field]) or (
                pd.isna(d.loc[uid, field]) and pd.isna(c.loc[uid, field])
            )
            if (uid, field) in ledger_keys:
                assert not same, (uid, field)
            else:
                assert same, (uid, field)
        same_ts = d.loc[uid, "warc_ts"] == c.loc[uid, "warc_ts"]
        assert same_ts == ((uid, "warc_ts") not in ledger_keys)
        # html is never touched — byte-identity invariant (input_hint)
        assert d.loc[uid, "html"] == c.loc[uid, "html"]
