"""Seeded randomized Spark-vs-oracle differential fuzz (r15).

The hand-built boundary fixtures (tests/test_properties.py, fixtures
1-17) pin the CONVENTIONS the hunt identified; this tool covers the
combinations nobody thought to write down: for each seed it generates
adversarial `events` / `documents` / `orders` tables (NULLs in every
nullable column, boundary timestamps, unicode/whitespace text, valid
and broken JSON, ±inf values, duplicate keys) and hash-compares a
broad subset of catalog entries against their registered DuckDB
oracles — the same rows+schema+value-hash gate the driver runs.

Deliberately EXCLUDED from generation (known, documented cross-engine
frontiers — each pinned or rationalized in COVERAGE.md, not bugs this
tool should re-find every run):
  * NaN in double columns (aggregate/window NaN-ordering differs by
    engine version; the engines' own docs disagree);
  * trailing-garbage JSON (Jackson vs DuckDB prefix-lenience,
    documented at dq_violations);
  * non-ASCII whitespace as a token separator (the family tokenizes
    by Java \\s — pinned by fixture 13);
  * NULL map keys (map_from_entries RAISES in BOTH engines);
  * values whose ROUND(x, 2) sits within half an ulp of a .xx5
    boundary: Spark's round re-decimalizes the double via its shortest
    string rendering (BigDecimal HALF_UP on Double.toString — 1247.985
    → 1247.99) while DuckDB rounds the BINARY value
    (1247.98499999... → 1247.98). Not expressible in portable SQL;
    the generator emits 2-decimal values so ROUND(,2) stays away from
    the boundary except for astronomically unlikely sums.

Usage: python tools/fuzz_differential.py [n_seeds] [start_seed]
Writes one line per (seed, entry) mismatch; exits nonzero on any.
"""
from __future__ import annotations

import hashlib
import os
import random
import string
import sys
import tempfile
from datetime import datetime, timedelta

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENT_TYPES = ["click", "view", "purchase", "error", "signup", None, "refund", "café"]
PROPS = [
    '{"k": %d}', '{"k": "%d"}', '{"k": null}', "{}", None, "{ba", "nul",
    '{"k": "4.6"}', '{"k": 4.6}', '{"k": "abc"}', "[1,2]", "null",
    '{"k": {"a": 1}}', '{"k": ".5"}', '{"k": true}',
]
TEXT_POOL = [
    None, "", "   ", "\t\t", "a", "the quick fox", "spam spam spam",
    "caf\xe9 d\xe9j\xe0 vu", "!!! ???", "\tTab led words here",
    "w0 " * 40, "the der die das", "x\ny\nz",
]


def gen_tables(seed: int, d: str) -> None:
    rng = random.Random(seed)
    t0 = datetime(2024, 1, 1)
    n_ev = rng.randint(30, 120)
    ev_rows = []
    for i in range(n_ev):
        ts = (
            None
            if rng.random() < 0.08
            else t0 + timedelta(seconds=rng.randint(-10**8, 10**8))
        )
        user = None if rng.random() < 0.08 else rng.randint(-3, 12)
        et = rng.choice(EVENT_TYPES)
        r = rng.random()
        value = (
            None if r < 0.15
            else float("inf") if r < 0.17
            else float("-inf") if r < 0.19
            else round(rng.uniform(-1000, 1500), 2)
        )
        p = rng.choice(PROPS)
        if p is not None and "%d" in p:
            p = p % rng.randint(-100, 100)
        ev_rows.append((i, ts, user, et, value, p))
    ev = pd.DataFrame(
        ev_rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    ev["user_id"] = ev["user_id"].astype("Int64")
    ev.to_parquet(os.path.join(d, "events.parquet"), index=False)

    n_doc = rng.randint(15, 40)
    doc_rows = []
    for i in range(n_doc):
        if rng.random() < 0.5:
            text = rng.choice(TEXT_POOL)
        else:
            text = " ".join(
                "".join(rng.choices(string.ascii_lowercase, k=rng.randint(1, 8)))
                for _ in range(rng.randint(1, 50))
            )
        lang = rng.choice(["en", "de", "fr", None, "zz", "4.2"])
        source = rng.choice(["web", "books", "cc", None])
        n_chars = None if text is None else len(text)
        doc_rows.append((i, text, lang, source, n_chars))
    docs = pd.DataFrame(
        doc_rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    docs["n_chars"] = docs["n_chars"].astype("Int64")
    docs.to_parquet(os.path.join(d, "documents.parquet"), index=False)

    n_ord = rng.randint(15, 60)
    o_rows = []
    for i in range(n_ord):
        key = None if rng.random() < 0.05 else i + 1
        cust = None if rng.random() < 0.1 else rng.randint(1, 10)
        status = rng.choice(["O", "F", "P", None])
        price = None if rng.random() < 0.12 else round(rng.uniform(0, 9000), 2)
        date = (
            None
            if rng.random() < 0.08
            else datetime(rng.randint(1992, 2001), rng.randint(1, 12), rng.randint(1, 28))
        )
        prio = rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW", None]
        )
        o_rows.append((key, cust, status, price, date, prio))
    orders = pd.DataFrame(
        o_rows, columns=["o_orderkey", "o_custkey", "o_orderstatus",
                         "o_totalprice", "o_orderdate", "o_orderpriority"],
    )
    orders["o_orderkey"] = orders["o_orderkey"].astype("Int64")
    orders["o_custkey"] = orders["o_custkey"].astype("Int64")
    orders["o_orderdate"] = orders["o_orderdate"].astype("datetime64[us]")
    orders.to_parquet(os.path.join(d, "orders.parquet"), index=False)


# Entries runnable on (events, documents, orders) alone — no joins to
# tables this generator doesn't build, no trained models, no file sinks.
ENTRIES = [
    "case_classifier", "filter_project_window", "dq_violations",
    "distinct_event_types", "exists_over_array", "global_denominators",
    "events_user_sequences", "streaming_sessionize",
    "streaming_tumbling_window_batch", "streaming_interval_join_batch",
    "events_last_touch_attribution", "events_funnel",
    "events_sliding_window", "dedup_latest_maxby", "collect_types_sorted",
    "json_extract_props", "json_variant_extract", "array_functions",
    "exports_report_events", "approx_aggregates", "exact_distinct_bounds",
    "sketch_count_min", "sketch_partial_merge", "null_profile_orders",
    "date_ops", "numeric_coercion", "text_token_stats", "text_c4_filter",
    "text_language_id", "text_quality_score", "text_fingerprint",
    "text_lang_mismatch", "text_unigram_logprob", "posexplode_tokens",
    "corpus_length_buckets", "corpus_normalize_dedup",
    "corpus_repetition_stats", "corpus_source_lang_rollup",
    "corpus_train_val_test_split", "corpus_feature_hashing",
    "corpus_chunk_documents", "corpus_chunk_documents_udtf",
    "corpus_sample_hash_mod", "corpus_length_trim", "dedup_exact",
    "multimodal_byte_stats", "upsert_full_outer", "topk_orders",
    "month_membership_filter",
]


def main() -> int:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 20260815
    from monthly_report_etl_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    oracles, queries = entrymod.oracle_sql(), entrymod.queries()

    def canon(df):
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    def vhash(df):
        return hashlib.sha256(
            df.to_csv(index=False, float_format="%.9g").encode()
        ).hexdigest()

    failures = 0
    for seed in range(start, start + n_seeds):
        d = tempfile.mkdtemp(prefix=f"fuzz_{seed}_")
        gen_tables(seed, d)
        con = duckdb.connect()
        con.execute("SET TimeZone='UTC'")
        for t in ("events", "documents", "orders"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
            )
        seed_bad = 0
        for name in ENTRIES:
            try:
                s = canon(queries[name](spark, d).toPandas())
                o = canon(con.execute(oracles[name]).fetchdf())
            except Exception as exc:
                print(f"seed={seed} {name} ERROR {type(exc).__name__}: "
                      f"{str(exc)[:160]}")
                failures += 1
                seed_bad += 1
                continue
            for c in s.columns:
                if c in o.columns and s[c].dtype != o[c].dtype:
                    try:
                        o[c] = o[c].astype(s[c].dtype)
                    except Exception:
                        pass
            if not (
                len(s) == len(o)
                and list(s.columns) == list(o.columns)
                and vhash(s) == vhash(o)
            ):
                print(f"seed={seed} {name} MISMATCH spark={len(s)} oracle={len(o)}")
                failures += 1
                seed_bad += 1
        print(f"seed={seed}: {len(ENTRIES) - seed_bad}/{len(ENTRIES)} ok",
              flush=True)
    print(f"TOTAL: {n_seeds} seeds x {len(ENTRIES)} entries, "
          f"{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
