"""Meta-contracts on the driver surface (__spark_entry__.py, bench.py):
the CORRECTNESS-window rotation policy, key hygiene, and bench-name
validity — regressions here silently starve new operators of their
driver-recorded correctness row (the round-3 verdict's #1 finding)."""

import glob
import json
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
import bench  # noqa: E402

WINDOW = 50


def _recorded_keys():
    rec = set()
    for path in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        rec |= set(json.load(open(path)))
    return rec


def test_every_unrecorded_oracle_query_inside_window():
    q = list(entry_mod.queries())
    oracles = entry_mod.oracle_sql()
    rec = _recorded_keys()
    starved = [k for k in q[WINDOW:] if k not in rec and k in oracles]
    assert starved == [], (
        f"oracle-backed queries outside the driver's {WINDOW}-row window "
        f"with no recorded correctness row: {starved}"
    )


def test_oracle_keys_subset_of_queries():
    q = set(entry_mod.queries())
    extra = set(entry_mod.oracle_sql()) - q
    assert extra == set(), f"oracles without a queries() entry: {extra}"


def test_rows_only_entries_are_known():
    q = set(entry_mod.queries())
    no_oracle = q - set(entry_mod.oracle_sql())
    # only by-design rows-only entries may lack an oracle. Round 9
    # (VERDICT r8 #1) flipped FIVE of the six: multimodal_features/
    # multimodal_frames via constructed golden payloads,
    # bpe_fertility_by_lang + bpe_packed_sequences via the closed-form
    # fixture corpus, and sketch_stats by replacing Spark-internal
    # approx_* with engine-reproducible KMV + hash-sample sketches.
    # What remains is exactly REAL-corpus subword inference, pinned by
    # tests/test_tokenizer.py's driver recount instead.
    assert no_oracle == {
        "bpe_token_stats",
    }, no_oracle


def test_bench_names_resolve():
    q = entry_mod.queries()
    missing = [n for n in bench.BENCH_QUERIES if n not in q]
    assert missing == []
    assert len(set(bench.BENCH_QUERIES)) == len(bench.BENCH_QUERIES)
