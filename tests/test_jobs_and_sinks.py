"""Golden-contract tests for the TSV sinks and the export/merge jobs
(SURVEY §5 test strategy #3: the sink contract can't be oracle-tested)."""

from __future__ import annotations

import csv
import glob
import io
import os

from pyspark.sql import functions as F

from monthly_report_etl_spark.config import PipelineConfig
from monthly_report_etl_spark.jobs import run_export_job, run_merge_job


def test_export_and_merge_jobs(spark, fixture_dir, tmp_path):
    out_dir = str(tmp_path / "output")
    merged_dir = str(tmp_path / "result")
    deals = os.path.join(fixture_dir, "exports_deals.parquet")
    comp = os.path.join(fixture_dir, "competitor_list.csv")

    report = run_export_job(spark, deals, comp, out_dir, PipelineConfig())
    n_expected = report.count()

    # one directory per lender
    lender_dirs = [d for d in os.listdir(out_dir) if d.startswith("associated_lender=")]
    n_lenders = report.select("associated_lender").distinct().count()
    assert len(lender_dirs) == n_lenders

    merged = run_merge_job(spark, out_dir, merged_dir)
    assert merged.count() == n_expected

    files = glob.glob(os.path.join(merged_dir, "part-*.csv"))
    assert len(files) == 1  # S6 single-file contract


def test_export_job_sized_parquet_output(spark, fixture_dir, tmp_path):
    """VERDICT r5 #7: the jobs path exercises the small-files guard — the
    optional parquet output routes through write_parquet_compacted, and
    at a deliberately tiny per-file target the part-file count tracks
    actual-output-bytes / target (>1, so the sizing repartition actually
    fired; ±1 tolerance because the final rewrite's compression groups
    rows differently than the staging write the count was derived from),
    with staging cleaned up and a complete read-back."""
    import math

    out_dir = str(tmp_path / "output")
    pq_dir = str(tmp_path / "report_parquet")
    deals = os.path.join(fixture_dir, "exports_deals.parquet")
    comp = os.path.join(fixture_dir, "competitor_list.csv")

    target_mb = 0.005
    report = run_export_job(
        spark, deals, comp, out_dir, PipelineConfig(),
        parquet_dir=pq_dir, parquet_target_file_mb=target_mb,
    )
    files = glob.glob(os.path.join(pq_dir, "part-*.parquet"))
    # reproduce the derivation: stage the same result the same way and
    # apply the same actual-bytes / target ceiling (parquet writes are
    # deterministic for the same plan + partitioning, so the staged
    # bytes — and hence the derived count — are too)
    restage = str(tmp_path / "restage")
    report.write.parquet(restage)
    staged_bytes = sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(restage, "part-*.parquet"))
    )
    expected = max(1, math.ceil(staged_bytes / (target_mb * 1024 * 1024)))
    assert len(files) == expected, (len(files), expected)
    assert len(files) > 1, "fixture too small to exercise the guard"
    assert not os.path.exists(pq_dir + "__staging"), "staging not cleaned"
    assert spark.read.parquet(pq_dir).count() == report.count()


def test_tsv_contract_bytes(spark, fixture_dir, tmp_path):
    """Byte-level contract of the sink: BOM, tab delimiter, QUOTE_ALL,
    '' for NULL, parseable with the csv module the reference validates
    with (run_exports_query.py:91-104)."""
    out_dir = str(tmp_path / "contract")
    deals = os.path.join(fixture_dir, "exports_deals.parquet")
    comp = os.path.join(fixture_dir, "competitor_list.csv")
    run_export_job(spark, deals, comp, out_dir, PipelineConfig())

    part = glob.glob(os.path.join(out_dir, "associated_lender=*", "part-*.csv"))[0]
    raw = open(part, "rb").read()
    assert raw.startswith(b"\xef\xbb\xbf")  # utf-8-sig BOM
    text = raw.decode("utf-8-sig")
    reader = csv.reader(io.StringIO(text), delimiter="\t")
    header = next(reader)
    assert len(header) > 20
    first = next(reader)
    assert len(first) == len(header)  # arity
    # QUOTE_ALL: every field of the raw first data line is quoted
    first_line = text.splitlines()[1]
    assert all(f.startswith('"') and f.endswith('"') for f in first_line.split("\t"))


def test_skip_bad_files_drops_whole_file(spark, tmp_path):
    """S4 fidelity: the reference skips a whole unreadable CSV with a
    warning and keeps going (merge_all_lenders.py:46-49). A file with a
    corrupt row must contribute ZERO rows; good files are untouched."""
    from monthly_report_etl_spark.sources import read_tsv_directory

    d = tmp_path / "tsvs"
    d.mkdir()
    (d / "good.csv").write_text('a\tb\n"1"\t"x"\n"2"\t"y"\n')
    # unclosed quote → CSV tokenizer failure inside the file
    (d / "bad.csv").write_text('a\tb\n"3\t"z"\n"broken\n')

    permissive = read_tsv_directory(spark, str(d), columns=["a", "b"])
    skipped = read_tsv_directory(spark, str(d), columns=["a", "b"], skip_bad_files=True)

    rows = {(r["a"], r["b"]) for r in skipped.collect()}
    assert rows == {("1", "x"), ("2", "y")}  # bad.csv fully dropped
    assert permissive.count() >= skipped.count()


def test_tsv_roundtrip_hostile_strings(spark, tmp_path):
    """Sink-contract fuzz: tabs, quotes, backslashes, and (with
    multi_line=True, the pandas-fidelity mode) embedded newlines all
    survive write_tsv → read_tsv_directory byte-exact."""
    from monthly_report_etl_spark.sources import read_tsv_directory, write_tsv

    nasty = [
        ("tab", "a\tb"),
        ("quote", 'say "hi"'),
        ("backslash", "c:\\path\\x"),
        ("newline", "line1\nline2"),
        ("quote_tab", '"\t"'),
        ("trailing_bs", "ends with \\"),
    ]
    df = spark.createDataFrame(nasty, ["k", "v"])
    out = str(tmp_path / "hostile")
    write_tsv(df, out, single_file=True, bom=True)
    back = {r["k"]: r["v"] for r in read_tsv_directory(spark, out, multi_line=True).collect()}
    assert back == dict(nasty)


def test_parquet_schema_evolution(spark, tmp_path):
    """mergeSchema: a dataset written in two schema generations (v2 adds
    a column) reads as the union schema with nulls for missing fields —
    the append-only schema-evolution contract a long-lived 100 TB corpus
    depends on."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "evolving")
    spark.range(3).select(F.col("id"), F.lit("a").alias("tag")).write.parquet(f"{p}/gen=1")
    spark.range(3, 6).select(
        F.col("id"), F.lit("b").alias("tag"), (F.col("id") * 10).alias("score")
    ).write.parquet(f"{p}/gen=2")
    merged = spark.read.option("mergeSchema", True).parquet(p)
    assert set(merged.columns) == {"id", "tag", "score", "gen"}
    assert merged.count() == 6
    assert merged.filter(F.col("score").isNull()).count() == 3  # v1 rows null-fill
    assert merged.filter((F.col("gen") == 2) & F.col("score").isNotNull()).count() == 3


def test_python_datasource_synthetic_docs(spark):
    """Custom source via the Spark 4 Python Data Source API: declared
    schema, planned partitions, per-partition deterministic reads."""
    from monthly_report_etl_spark.sources.synthetic import _make_doc, register

    register(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("numDocs", 120)
        .option("numPartitions", 5)
        .load()
    )
    assert df.count() == 120
    assert df.rdd.getNumPartitions() == 5
    assert dict(df.dtypes) == {"doc_id": "bigint", "text": "string", "n_words": "int"}
    got = {r["doc_id"]: (r["text"], r["n_words"]) for r in df.collect()}
    assert len(got) == 120  # doc_ids unique across partitions
    for i in (0, 61, 119):
        did, text, n = _make_doc(i)
        assert got[i] == (text, n)


def test_python_datasource_manifest_sink(spark, tmp_path):
    """Custom sink via the Python Data Source API: per-task part files,
    driver-side commit publishing a manifest of exactly the committed
    files and total row count."""
    import json

    from monthly_report_etl_spark.sources.synthetic import register

    register(spark)
    out = str(tmp_path / "mj")
    (
        spark.range(100)
        .selectExpr("id", "id * 2 AS twice")
        .repartition(4)
        .write.format("manifest_jsonl")
        .option("path", out)
        .mode("append")
        .save()
    )
    man = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert man["n_rows"] == 100 and len(man["files"]) == 4
    rows = []
    for f in man["files"]:
        with open(os.path.join(out, f)) as fh:
            rows += [json.loads(line) for line in fh]
    assert len(rows) == 100
    assert sum(r["id"] for r in rows) == 4950
    assert all(r["twice"] == 2 * r["id"] for r in rows)


def test_merged_time_reinference(spark, fixture_dir, tmp_path):
    """merge job re-infers `time` (merge_all_lenders.py:58-59): the merged
    frame's time parses to timestamps, nulls only where source was null."""
    out_dir, merged_dir = str(tmp_path / "o"), str(tmp_path / "m")
    deals = os.path.join(fixture_dir, "exports_deals.parquet")
    comp = os.path.join(fixture_dir, "competitor_list.csv")
    run_export_job(spark, deals, comp, out_dir, PipelineConfig())
    merged = run_merge_job(spark, out_dir, merged_dir)
    assert dict(merged.dtypes)["time"] == "timestamp"
    assert merged.filter(F.col("time").isNull()).count() == 0


def test_dynamic_partition_overwrite_touches_only_written_partitions(spark, sf_dir, tmp_path):
    """partitionOverwriteMode=dynamic: an overwrite that writes only one
    lang's rows replaces THAT partition directory and leaves every other
    partition byte-identical — the idempotent-daily-rerun contract (a
    static overwrite would wipe the whole table first)."""
    out = str(tmp_path / "docs_parted")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    d.write.partitionBy("lang").parquet(out)
    before = {
        r["lang"]: r["n"]
        for r in spark.read.parquet(out).groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            d.filter(F.col("lang") == "en")
            .withColumn("doc_id", F.col("doc_id") + 10_000_000)
            .write.mode("overwrite")
            .partitionBy("lang")
            .parquet(out)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    back = spark.read.parquet(out)
    after = {r["lang"]: r["n"] for r in back.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert after == before  # same row counts everywhere
    assert back.filter((F.col("lang") == "en") & (F.col("doc_id") < 10_000_000)).count() == 0
    assert back.filter((F.col("lang") != "en") & (F.col("doc_id") >= 10_000_000)).count() == 0


def test_write_parquet_sized_targets_file_count(spark, sf_dir, tmp_path):
    """The small-files guard: file count follows the planned input size /
    target ratio — a 3x-unioned input at a 1 MB target writes 3 files, a
    huge target writes exactly 1, and both read back complete."""
    import glob
    import os

    from monthly_report_etl_spark.sources.parquet import (
        read_table,
        write_parquet_sized,
    )

    li = read_table(spark, sf_dir, "lineitem")
    n_rows = li.count()
    tri = li.union(li).union(li)

    one = str(tmp_path / "one")
    n_big = write_parquet_sized(li, one, target_file_mb=10_000)
    assert n_big == 1
    assert len(glob.glob(os.path.join(one, "*.parquet"))) == 1

    multi = str(tmp_path / "multi")
    # sf0.001 lineitem is ~100 KB on disk; at sf0.01 it is ~1 MB — pick
    # the target so the 3x union lands above one file either way
    target = 1.0 if n_rows > 30_000 else 0.1
    n_multi = write_parquet_sized(tri, multi, target_file_mb=target)
    files = glob.glob(os.path.join(multi, "*.parquet"))
    assert n_multi >= 2
    assert len(files) == n_multi
    assert spark.read.parquet(multi).count() == 3 * n_rows


def test_export_job_dual_sink_executes_report_plan_once(
    spark, fixture_dir, tmp_path, monkeypatch
):
    """VERDICT r7 #7: insurance on the dual-sink economy — when both the
    TSV and parquet sinks are requested, the report plan must be BUILT
    once and EXECUTED once (into the staging parquet), with both sinks
    reading the staged scan. A regression to the naive
    ``write_tsv(report); write_parquet_sized(report)`` sequence would
    run the full join/agg plan twice — at 100 TB that doubles the
    dominant cost. Asserted structurally: the report builder is called
    exactly once, and the DataFrames reaching BOTH sink writers list the
    staging directory's files as their scan inputs (``inputFiles`` is
    empty/different for a computed join plan)."""
    import monthly_report_etl_spark.jobs as jobs_mod
    import monthly_report_etl_spark.sources.parquet as parquet_mod

    deals = os.path.join(fixture_dir, "exports_deals.parquet")
    comp = os.path.join(fixture_dir, "competitor_list.csv")
    out_dir = str(tmp_path / "tsv")
    pq_dir = str(tmp_path / "parquet")
    staging = pq_dir.rstrip("/") + "__staging"

    plan_builds = []
    real_monthly_report = jobs_mod.monthly_report

    def counting_monthly_report(*a, **kw):
        plan_builds.append(1)
        return real_monthly_report(*a, **kw)

    sink_inputs: dict[str, list[str]] = {}
    real_write_tsv = jobs_mod.write_tsv
    real_write_sized = parquet_mod.write_parquet_sized

    def spy_write_tsv(df, path, **kw):
        sink_inputs["tsv"] = list(df.inputFiles())
        return real_write_tsv(df, path, **kw)

    def spy_write_sized(df, path, **kw):
        sink_inputs["parquet"] = list(df.inputFiles())
        return real_write_sized(df, path, **kw)

    monkeypatch.setattr(jobs_mod, "monthly_report", counting_monthly_report)
    monkeypatch.setattr(jobs_mod, "write_tsv", spy_write_tsv)
    monkeypatch.setattr(parquet_mod, "write_parquet_sized", spy_write_sized)

    run_export_job(spark, deals, comp, out_dir, PipelineConfig(), parquet_dir=pq_dir)

    assert len(plan_builds) == 1, "report plan built more than once"
    for sink in ("tsv", "parquet"):
        assert sink in sink_inputs, f"{sink} sink never invoked"
        files = sink_inputs[sink]
        assert files and all(staging in f for f in files), (
            f"{sink} sink does not read the staged scan: {files[:3]}"
        )


def _write_minimal_xlsx(path, rows, inline=False, omit_refs=False, absolute_target=False):
    """Stdlib OOXML writer for fixtures: shared-string or inline-string
    cells, sparse rows allowed (None skips the cell). ``omit_refs``
    drops the optional r= cell references (position implied — the
    streaming-writer shape); ``absolute_target`` writes the sheet
    relationship with an absolute OPC target."""
    import zipfile

    def esc(s):
        return (
            str(s).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    shared, sindex = [], {}
    body = []
    for ri, row in enumerate(rows, start=1):
        cells = []
        for ci, val in enumerate(row):
            if val is None:
                if omit_refs:
                    # implied positions can't skip columns; emit an
                    # empty cell to hold the slot
                    cells.append("<c/>")
                continue
            ref = "" if omit_refs else f' r="{chr(ord("A") + ci)}{ri}"'
            if inline:
                cells.append(
                    f"<c{ref} t=\"inlineStr\"><is><t>{esc(val)}</t></is></c>"
                )
            else:
                if val not in sindex:
                    sindex[val] = len(shared)
                    shared.append(val)
                cells.append(f"<c{ref} t=\"s\"><v>{sindex[val]}</v></c>")
        body.append(f'<row r="{ri}">{"".join(cells)}</row>')
    sheet = f'<worksheet {ns}><sheetData>{"".join(body)}</sheetData></worksheet>'
    sst = (
        f'<sst {ns} count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{esc(s)}</t></si>" for s in shared)
        + "</sst>"
    )
    rel_ns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    pkg_ns = "http://schemas.openxmlformats.org/package/2006/relationships"
    wb = (
        f'<workbook {ns} xmlns:r="{rel_ns}"><sheets>'
        f'<sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    target = (
        "/xl/worksheets/sheet1.xml" if absolute_target else "worksheets/sheet1.xml"
    )
    wb_rels = (
        f'<Relationships xmlns="{pkg_ns}">'
        f'<Relationship Id="rId1" Type="{rel_ns}/worksheet" '
        f'Target="{target}"/></Relationships>'
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
        if not inline:
            z.writestr("xl/sharedStrings.xml", sst)


def test_xlsx_lookup_matches_csv_twin(spark, tmp_path):
    """S3 twin contract: the same dimension content read via the stdlib
    .xlsx source and via read_lookup_csv must produce identical
    DataFrames (schema applied, blanks as NULL) — covering shared-string
    AND inline-string cell encodings plus a sparse (missing-cell) row."""
    from monthly_report_etl_spark.schemas import COMPETITOR_LIST_SCHEMA
    from monthly_report_etl_spark.sources import read_lookup_csv, read_lookup_xlsx

    rows = [
        ["Lender", "Category", "Tier", "Tier Category", "Link to Image"],
        ["anz", "Major Bank", "Tier 1", "Major Bank", None],
        ["cba", "Major Bank", "Tier 1", "Major Bank", "https://x/y"],
        ["ing", "Intl Bank", "Tier 2", None, None],
    ]
    csv_path = tmp_path / "twin.csv"
    csv_path.write_text(
        "\n".join(",".join("" if v is None else v for v in r) for r in rows),
        encoding="utf-8-sig",
    )
    for inline in (False, True):
        xlsx_path = str(tmp_path / f"twin_{inline}.xlsx")
        _write_minimal_xlsx(xlsx_path, rows, inline=inline)
        via_xlsx = read_lookup_xlsx(spark, xlsx_path, COMPETITOR_LIST_SCHEMA)
        via_csv = read_lookup_csv(spark, str(csv_path), COMPETITOR_LIST_SCHEMA)
        assert via_xlsx.schema == via_csv.schema
        assert sorted(map(tuple, via_xlsx.collect())) == sorted(
            map(tuple, via_csv.collect())
        )


def test_reference_xlsx_matches_reference_csv(spark):
    """The actual residual from VERDICT r5-r7: the reference ships
    competitor-list.xlsx as an unread twin of competitor-list.csv. Prove
    the two files carry the same table through this engine's two lookup
    sources (loaded from /root/reference at test time, never copied —
    same policy as the exports ref-SQL differential)."""
    import os

    import pytest as _pytest

    from monthly_report_etl_spark.schemas import COMPETITOR_LIST_SCHEMA
    from monthly_report_etl_spark.sources import read_lookup_csv, read_lookup_xlsx

    xlsx = "/root/reference/competitor-list.xlsx"
    ref_csv = "/root/reference/competitor-list.csv"
    if not (os.path.exists(xlsx) and os.path.exists(ref_csv)):
        _pytest.skip("reference files not present")
    a = read_lookup_xlsx(spark, xlsx, COMPETITOR_LIST_SCHEMA)
    b = read_lookup_csv(spark, ref_csv, COMPETITOR_LIST_SCHEMA)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    diffs = [(x, y) for x, y in zip(ra, rb) if x != y]
    assert ra == rb, (
        f"lengths {len(ra)} vs {len(rb)}; first row diff: {diffs[:1]}"
    )


def test_xlsx_reader_handles_rless_cells_and_absolute_targets(tmp_path):
    """Regression for two review-confirmed defects: (a) cells without
    the optional r= reference take sequentially implied positions
    (ECMA-376 streaming-writer shape) instead of collapsing onto column
    A; (b) an absolute OPC relationship target
    ("/xl/worksheets/sheet1.xml") resolves instead of KeyError-ing."""
    from monthly_report_etl_spark.sources.xlsx import read_xlsx_rows

    rows = [["h1", "h2", "h3"], ["a", None, "c"], ["d", "e", "f"]]
    p1 = str(tmp_path / "rless.xlsx")
    _write_minimal_xlsx(p1, rows, omit_refs=True)
    assert read_xlsx_rows(p1) == [
        ["h1", "h2", "h3"],
        ["a", None, "c"],
        ["d", "e", "f"],
    ]

    p2 = str(tmp_path / "abs.xlsx")
    _write_minimal_xlsx(p2, rows, absolute_target=True)
    assert read_xlsx_rows(p2) == [
        ["h1", "h2", "h3"],
        ["a", None, "c"],
        ["d", "e", "f"],
    ]
