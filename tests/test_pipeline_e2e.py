"""End-to-end tests of the image+caption quality-filter pipeline vs golden labels.

BASELINE.json acceptance: keep/drop F1 ≥ 0.99 vs the pure-pandas reference labels,
exact scrubbed-caption equality, PSNR ≥ 40 dB on lossy formats, resume ≡ fresh run.
"""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_quality_check_spark.pipeline import codecs
from data_quality_check_spark.pipeline.fixtures import generate_images_pdf, write_images_parquet
from data_quality_check_spark.pipeline.reference_impl import compute_golden
from data_quality_check_spark.pipeline.run import FilterConfig, run_filter

N_ROWS = 1500


@pytest.fixture(scope="module")
def fixture_paths(tmp_path_factory):
    root = tmp_path_factory.mktemp("images")
    path = os.path.join(root, "images.parquet")
    write_images_parquet(path, n=N_ROWS)
    return str(root), path


@pytest.fixture(scope="module")
def golden(fixture_paths):
    return compute_golden(generate_images_pdf(n=N_ROWS))


@pytest.fixture(scope="module")
def pipeline_out(spark, fixture_paths, tmp_path_factory):
    root, path = fixture_paths
    out = str(tmp_path_factory.mktemp("out"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    summary = run_filter(spark, path, out, ckpt, FilterConfig())
    return out, ckpt, summary


def test_keep_f1_and_caption_equality(spark, golden, pipeline_out):
    out, _, summary = pipeline_out
    kept = spark.read.parquet(os.path.join(out, "filtered")).toPandas()

    g = golden.drop_duplicates(subset=["image_id"]).set_index("image_id")
    got_ids = set(kept["image_id"])
    want_ids = set(g.index[g["keep"]])

    tp = len(got_ids & want_ids)
    fp = len(got_ids - want_ids)
    fn = len(want_ids - got_ids)
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)
    assert f1 >= 0.99, f"keep/drop F1 {f1:.4f} (p={precision:.4f}, r={recall:.4f})"
    # in fact agreement should be exact — same kernels on both sides
    assert f1 == 1.0

    # exact scrubbed-caption equality on kept rows
    merged = kept.set_index("image_id").join(g[["scrubbed_caption"]], rsuffix="_gold")
    mismatches = merged[merged["scrubbed_caption"] != merged["scrubbed_caption_gold"]]
    assert len(mismatches) == 0, mismatches.head()

    # a sane mix actually got dropped (fixture injects ~35-45% defects)
    assert 0.3 < len(want_ids) / N_ROWS < 0.9
    assert summary["rows_kept"] == len(got_ids)


def test_scrub_actually_fired(golden):
    g = golden[golden["keep"]]
    scrubbed = g[g["scrubbed_caption"] != g["caption"].str.strip()]
    assert len(scrubbed) > 10  # PII/toxic injections survive heuristics and get rewritten
    assert scrubbed["scrubbed_caption"].str.contains(r"\[EMAIL\]|\[PHONE\]|\[TOXIC\]").any()
    # no raw PII left in any kept caption
    assert not g["scrubbed_caption"].str.contains("@example.com").any()
    assert not g["scrubbed_caption"].str.contains(r"\+336", regex=True).any()


def test_pixels_preserved_psnr(spark, pipeline_out):
    """Kept rows carry original bytes; decoded pixels must match the procedural
    source at PSNR ≥ 40 dB (lossless exact, jpeg ≈ 46 dB)."""
    from data_quality_check_spark.pipeline.fixtures import _make_image

    out, _, _ = pipeline_out
    kept = (
        spark.read.parquet(os.path.join(out, "filtered"))
        .select("image_id", "bytes", "fmt")
        .limit(200)
        .toPandas()
    )
    assert len(kept) > 50
    checked_lossy = 0
    for _, row in kept.iterrows():
        orig, _, _, fmt = _make_image(row["image_id"])
        dec = codecs.decode(row["bytes"])
        assert dec is not None, row["image_id"]
        p = codecs.psnr(orig, dec)
        if fmt == "jpeg":
            checked_lossy += 1
            assert p >= 40.0, (row["image_id"], fmt, p)
        else:
            assert p == float("inf"), (row["image_id"], fmt, p)
    assert checked_lossy > 5


def test_resume_equals_fresh(spark, fixture_paths, tmp_path_factory, pipeline_out):
    """Kill-after-k-buckets: run 5 buckets, 'crash', resume; output ≡ fresh run."""
    _, path = fixture_paths
    out2 = str(tmp_path_factory.mktemp("out2"))
    ckpt2 = str(tmp_path_factory.mktemp("ckpt2"))

    cfg = FilterConfig()
    s1 = run_filter(spark, path, out2, ckpt2, cfg, max_buckets=5)
    assert len(s1["processed_buckets"]) == 5
    s2 = run_filter(spark, path, out2, ckpt2, cfg)
    assert len(s2["processed_buckets"]) == cfg.num_buckets - 5
    s3 = run_filter(spark, path, out2, ckpt2, FilterConfig())
    assert s3["processed_buckets"] == []  # everything checkpointed

    fresh_out, _, _ = pipeline_out
    a = (
        spark.read.parquet(os.path.join(fresh_out, "filtered"))
        .select("image_id", "scrubbed_caption")
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    b = (
        spark.read.parquet(os.path.join(out2, "filtered"))
        .select("image_id", "scrubbed_caption")
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_ppl_grouped_equals_map(spark, fixture_paths, tmp_path_factory):
    """Salted applyInPandas perplexity ≡ map-side perplexity.

    Equality is to 1e-9 relative, not bitwise: np.add.reduceat's pairwise
    summation blocks depend on where a string sits inside the batch buffer, so
    regrouping rows can shift the last ~2 ulps. Keep/drop thresholds sit orders
    of magnitude away from any data point, so labels are unaffected.
    """
    _, path = fixture_paths
    out3 = str(tmp_path_factory.mktemp("out3"))
    ckpt3 = str(tmp_path_factory.mktemp("ckpt3"))
    run_filter(spark, path, out3, ckpt3, FilterConfig(ppl_mode="grouped"))

    from data_quality_check_spark.pipeline.run import decide

    df = spark.read.parquet(path).limit(300)
    m = decide(df, FilterConfig(ppl_mode="map")).select("image_id", "ppl").toPandas()
    gset = decide(df, FilterConfig(ppl_mode="grouped")).select("image_id", "ppl").toPandas()
    merged = m.merge(gset, on="image_id", suffixes=("_map", "_grp"))
    np.testing.assert_allclose(
        merged["ppl_map"].to_numpy(), merged["ppl_grp"].to_numpy(), rtol=1e-9
    )


def test_fused_equals_modular(spark, fixture_paths):
    """One-crossing mapInPandas stage ≡ the three chained column UDFs."""
    _, path = fixture_paths
    from data_quality_check_spark.pipeline.run import decide

    cols = ["image_id", "flag_decode_failed", "lang", "lang_conf", "ppl", "keep",
            "drop_reason", "scrubbed_caption"]
    df = spark.read.parquet(path)
    a = decide(df, FilterConfig(ppl_mode="map")).select(cols).toPandas().sort_values(
        "image_id").reset_index(drop=True)
    b = decide(df, FilterConfig(ppl_mode="modular")).select(cols).toPandas().sort_values(
        "image_id").reset_index(drop=True)
    for c in ["image_id", "flag_decode_failed", "lang", "keep", "drop_reason",
              "scrubbed_caption"]:
        assert a[c].fillna("∅").tolist() == b[c].fillna("∅").tolist(), c
    for c in ["lang_conf", "ppl"]:  # batch-layout-dependent last-ulp drift only
        np.testing.assert_allclose(a[c].to_numpy(), b[c].to_numpy(), rtol=1e-9)


def test_metrics_and_manifest(spark, pipeline_out):
    _, ckpt, _ = pipeline_out
    manifest = spark.read.parquet(os.path.join(ckpt, "manifest")).toPandas()
    assert sorted(manifest["bucket"].unique()) == list(range(FilterConfig().num_buckets))
    metrics = spark.read.parquet(os.path.join(ckpt, "metrics")).toPandas()
    assert metrics["rows_in"].sum() >= N_ROWS  # includes duplicate re-appends
    assert (metrics["rows_kept"] <= metrics["rows_in"]).all()
    assert metrics["n_scrubbed"].sum() > 0


def test_scrub_col_equals_python(spark):
    from data_quality_check_spark.functions.scrub import (
        make_scrub_udf,
        scrub_col,
        scrub_series,
        scrub_text,
    )

    samples = [
        "contact me at john.doe+spam@mail.example.org please",
        "call +33 6 12 34 56 78 now",
        "dial 555-123-4567 or 555.123.4567",
        "you STUPID idiot",
        "Stupidity is not toxic",  # substring must NOT match (word boundary)
        "plain caption with nothing to scrub",
        "two emails a@b.co c@d.io and +4912345678",
        None,
        # ASCII-lookaround boundaries must agree between Java regex and python
        # re next to non-ASCII letters (plain \b diverges: Java \b is ASCII-\w,
        # python \b is Unicode)
        "you stupidé person",
        "åstupid prefix accent",
        "call 555-123-4567é now",
    ]
    pdf = pd.DataFrame({"caption": samples})
    sdf = spark.createDataFrame(pdf)
    got_col = sdf.select(scrub_col("caption").alias("s")).toPandas()["s"].tolist()
    got_udf = sdf.select(make_scrub_udf()(F.col("caption")).alias("s")).toPandas()["s"].tolist()
    want = [scrub_text(s) for s in samples]
    assert got_col == want
    assert got_udf == want
    assert want[4] == "Stupidity is not toxic"
    # the fused-stage vectorized twin = scrub_text ∘ strip, None-preserving
    padded = ["  " + s + " " if s else s for s in samples]
    got_series = scrub_series(pd.Series(padded, dtype=object)).tolist()
    want_stripped = [scrub_text(s.strip()) if s is not None else None for s in padded]
    assert [None if pd.isna(g) else g for g in got_series] == want_stripped


def test_prebucketed_input_equals_flat(spark, fixture_paths, pipeline_out, tmp_path_factory):
    """The production layout — input partitioned by bucket(B, image_id) — must
    produce byte-identical results to the flat layout, with NO exchange in the
    write plan (the storage-partitioned property the Iceberg design is for)."""
    from data_quality_check_spark.pipeline.fixtures import write_images_parquet_spark

    cfg = FilterConfig()
    bdir = str(tmp_path_factory.mktemp("bucketed_in"))
    write_images_parquet_spark(
        spark, bdir, n=N_ROWS, num_files=cfg.num_buckets, bucket_by_id=cfg.num_buckets
    )
    raw = spark.read.parquet(bdir)
    assert "_bucket" in raw.columns  # discovered partition column
    out = str(tmp_path_factory.mktemp("out_b"))
    ckpt = str(tmp_path_factory.mktemp("ckpt_b"))
    summary = run_filter(spark, bdir, out, ckpt, cfg)

    flat_out, _, flat_summary = pipeline_out
    assert summary["rows_in"] == flat_summary["rows_in"]
    assert summary["rows_kept"] == flat_summary["rows_kept"]
    a = (
        spark.read.parquet(os.path.join(out, "filtered"))
        .select("image_id", "scrubbed_caption", "lang")
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    b = (
        spark.read.parquet(os.path.join(flat_out, "filtered"))
        .select("image_id", "scrubbed_caption", "lang")
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_whitespace_captions_agree_with_golden(spark):
    """Tab/newline/U+00A0-padded captions: Spark trim_col and the golden
    str.strip(WS_CHARS) must make identical keep/scrub decisions (Spark F.trim
    strips only ' '; python str.strip() strips all Unicode whitespace — both
    were drift bugs until the canonical WS_CHARS set)."""
    import numpy as np

    from data_quality_check_spark.pipeline import codecs
    from data_quality_check_spark.pipeline.reference_impl import compute_golden
    from data_quality_check_spark.pipeline.run import FilterConfig, decide

    captions = [
        "\tN/A",                    # strips to a fake null -> drop
        "A red car parked outside the station\n",  # kept, scrub must not keep the \n
        "  the cat sat on the mat warm\x0c",
        " padded with nbsp the quick brown fox",  # U+00A0 is NOT in WS_CHARS
        "a MOSTLY normal caption about the weather today",
    ]
    rows = []
    for i, cap in enumerate(captions):
        arr = np.random.RandomState(i).randint(0, 256, (8, 8, 3), dtype=np.uint8)
        rows.append(
            {
                "image_id": f"img{i:03d}",
                "bytes": codecs.encode(arr, "png"),
                "w": 8,
                "h": 8,
                "fmt": "png",
                "caption": cap,
                "phash": codecs.average_hash(arr),
            }
        )
    pdf = pd.DataFrame(rows)
    golden = compute_golden(pdf)
    sdf = spark.createDataFrame(
        [(r["image_id"], bytearray(r["bytes"]), r["w"], r["h"], r["fmt"], r["caption"], r["phash"]) for r in rows],
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )
    got = {
        r.image_id: (r.keep, r.scrubbed_caption)
        for r in decide(sdf, FilterConfig()).collect()
    }
    for _, g in golden.iterrows():
        keep, scrub = got[g["image_id"]]
        assert keep == g["keep"], g["image_id"]
        assert scrub == g["scrubbed_caption"], g["image_id"]
    assert not golden[golden["caption"] == "\tN/A"]["keep"].iloc[0]


def test_image_flag_semantics(spark):
    """Edge semantics of the image-axis flags: NULL metadata defaults to
    flagged (can't validate what isn't there), format match is case-folded,
    and the byte-plausibility window is [16, 3wh + slack]."""
    from pyspark.sql import functions as F

    from data_quality_check_spark.pipeline import heuristics as H

    rows = [
        # (w, h, byte_len, fmt) -> (bad_dims, bytes_implausible, bad_fmt)
        (100, 100, 5000, "png", False, False, False),
        (100, 100, 5000, "PNG", False, False, False),  # case-folded
        (None, 100, 5000, "png", True, True, False),  # null dim flags both
        (100, 100, None, "gif", False, True, True),  # null bytes; bad container
        (100, 100, 5000, None, False, False, True),  # null fmt is bad
        (1000, 100, 5000, "webp", True, False, False),  # aspect 10 > 8
        (100, 100, 8, "jpeg", False, True, False),  # truncated file
        # slack = BASE + PER_16K·(raw//16384 + 1) = 96 + 5 = 101 for a 10×10
        (10, 10, 10 * 10 * 3 + 101, "png", False, False, False),  # slack edge: ok
        (10, 10, 10 * 10 * 3 + 102, "png", False, True, False),  # past slack
    ]
    df = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3]) for r in rows],
        "w int, h int, byte_len long, fmt string",
    )
    flags = H.image_flags(F.col("w"), F.col("h"), F.col("byte_len"))
    got = df.select(
        flags["flag_bad_dims"].alias("d"),
        flags["flag_bytes_implausible"].alias("b"),
        H.bad_fmt_flag(F.col("fmt")).alias("f"),
    ).collect()
    for row, exp in zip(got, rows):
        assert (row.d, row.b, row.f) == exp[4:], (row, exp)


def test_synthetic_image_meta_injection_rates(spark):
    """The deterministic gate synthesis must actually exercise every flag."""
    from data_quality_check_spark.gate_fixtures import synthetic_image_meta_df

    docs = spark.range(0, 500).select(
        F.col("id").alias("doc_id"), F.lit("a caption").alias("text")
    )
    img = synthetic_image_meta_df(docs).collect()
    assert len(img) == 500
    degenerate = sum(1 for r in img if r.h == 4)
    truncated = sum(1 for r in img if r.byte_len == 8)
    oversized = sum(1 for r in img if r.byte_len == r.w * r.h * 3 + 4096)
    bad_fmt = sum(1 for r in img if r.fmt in ("gif", "bmp"))
    assert degenerate == len([i for i in range(500) if i % 97 == 0])
    assert truncated == len([i for i in range(500) if i % 89 == 0])
    assert oversized == len([i for i in range(500) if i % 83 == 0 and i % 89 != 0])
    assert bad_fmt == 200


def test_synthetic_phash_planted_pairs_exact(spark):
    """The phash gate answer is EXACTLY the planted pair set: every 10th image
    carries the previous image's 60-bit hash with doc_id%3+1 contiguous bits
    flipped, and the distinct-prime chunk moduli make accidental Hamming≤3
    pairs vanishingly rare (zero verified out to 60k ids offline)."""
    from data_quality_check_spark.gate_fixtures import (
        PHASH_PLANT_EVERY,
        synthetic_image_meta_df,
    )
    from data_quality_check_spark.operators import dedup as DD

    n = 3000
    docs = spark.range(0, n).select(
        F.col("id").alias("doc_id"), F.lit("cap").alias("text")
    )
    img = synthetic_image_meta_df(docs)
    pairs = DD.hamming_near_pairs(
        img.select("image_id", "phash"), "image_id", "phash", max_hamming=3
    ).collect()
    DD.release_pins()
    expected = {
        (d - 1, d, d % 3 + 1)
        for d in range(PHASH_PLANT_EVERY, n, PHASH_PLANT_EVERY)
    }
    assert {(r.id_a, r.id_b, r.hamming) for r in pairs} == expected


def test_dup_broadcast_fallback_identical(spark, tmp_path_factory):
    """A ~50% duplicate-rate input forced down the non-broadcast path
    (max_broadcast_decisions tiny → bucket-partitioned decision spill +
    per-group commits) must produce byte-identical output and checkpoint
    totals to the broadcast path (VERDICT r1 item 4)."""
    root = tmp_path_factory.mktemp("dupheavy")
    path = os.path.join(root, "images.parquet")
    write_images_parquet(path, n=600, dup_rate=0.5)

    def run(mode_cfg, tag):
        out = str(tmp_path_factory.mktemp(f"out_{tag}"))
        ckpt = str(tmp_path_factory.mktemp(f"ckpt_{tag}"))
        s = run_filter(spark, path, out, ckpt, mode_cfg)
        pdf = (
            spark.read.parquet(os.path.join(out, "filtered"))
            .drop("_bucket")
            .toPandas()
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        return s, pdf, ckpt

    s_b, pdf_b, _ = run(FilterConfig(num_buckets=16), "bcast")
    cfg_f = FilterConfig(num_buckets=16, max_broadcast_decisions=10)
    s_f, pdf_f, ckpt_f = run(cfg_f, "fallback")

    assert s_f["rows_in"] == s_b["rows_in"]
    assert s_f["rows_kept"] == s_b["rows_kept"]
    pd.testing.assert_frame_equal(pdf_b, pdf_f)
    # the fallback really spilled a bucket-partitioned decisions table
    spill = os.path.join(ckpt_f, "dup_decisions", cfg_f.run_id)
    assert os.path.isdir(spill)
    assert any(d.startswith("_bucket=") for d in os.listdir(spill))
    # and committed more than one manifest group (per-group checkpointing)
    manifests = spark.read.parquet(os.path.join(ckpt_f, "manifest"))
    assert manifests.select("committed_at").distinct().count() > 1


def test_near_dup_decisions_groups_by_phash_hamming(spark):
    """Perceptual mode: ids whose phashes differ by <= k bits form one group
    (min id wins); the exact path leaves them untouched. Same-id copies keep
    exactly one physical row in both modes."""
    from data_quality_check_spark.operators.dedup import release_pins
    from data_quality_check_spark.pipeline.run import dup_decisions, near_dup_decisions

    base = 0x0123456789ABCDEF
    rows = [
        ("img_a", base, 1),
        ("img_b", base ^ (1 << 7), 2),     # hamming 1 from img_a → near-dup
        ("img_c", base ^ 0xFF00000000, 3),  # hamming 8 → unrelated
        ("img_d", 42, 4),                   # same-id copies, same phash
        ("img_d", 42, 5),
    ]
    df = spark.createDataFrame(rows, "image_id string, phash long, rid long")

    exact = {r.image_id: r for r in dup_decisions(df).collect()}
    near = {r.image_id: r for r in near_dup_decisions(df, max_hamming=3).collect()}
    release_pins()

    # exact mode: only the same-id copy pair acts; no cross-id losers
    assert set(exact) == {"img_d"}
    assert not exact["img_d"].is_loser and exact["img_d"].keep_rid == 4

    # near mode: img_b loses to img_a (hamming 1); img_c untouched; img_d same
    assert set(near) == {"img_a", "img_b", "img_d"}
    assert not near["img_a"].is_loser
    assert near["img_b"].is_loser
    assert not near["img_d"].is_loser and near["img_d"].keep_rid == 4

    # config dispatch picks the right variant
    from data_quality_check_spark.pipeline.run import FilterConfig, decisions_for

    got_n = {r.image_id for r in decisions_for(df, FilterConfig(near_dup_hamming=3)).collect()}
    got_e = {r.image_id for r in decisions_for(df, FilterConfig()).collect()}
    release_pins()
    assert got_n == set(near) and got_e == set(exact)


def test_near_dup_acting_broadcast_gate_identical(spark):
    """ADVICE r2: the internal `acting` semi-join broadcast in
    near_dup_decisions is size-gated; forcing the shuffled path
    (max_broadcast=0) must yield identical decisions."""
    from data_quality_check_spark.operators.dedup import release_pins
    from data_quality_check_spark.pipeline.run import near_dup_decisions

    base = 0x0123456789ABCDEF
    rows = [
        ("img_a", base, 1),
        ("img_b", base ^ (1 << 7), 2),
        ("img_c", base ^ 0xFF00000000, 3),
        ("img_d", 42, 4),
        ("img_d", 42, 5),
    ]
    df = spark.createDataFrame(rows, "image_id string, phash long, rid long")
    bcast = sorted(map(tuple, near_dup_decisions(df, 3).collect()))
    release_pins()
    shuffled = sorted(map(tuple, near_dup_decisions(df, 3, max_broadcast=0).collect()))
    release_pins()
    assert bcast == shuffled


# ── write-audit-publish (pipeline/publish.py) ──


def test_audit_and_publish_promotes_good_run(spark, fixture_paths, tmp_path):
    from data_quality_check_spark.pipeline.publish import audit_and_publish

    _, path = fixture_paths
    out = str(tmp_path / "staged")
    ckpt = str(tmp_path / "ckpt")
    run_filter(spark, path, out, ckpt, FilterConfig())
    final = str(tmp_path / "published" / "v1")
    report = audit_and_publish(spark, out, ckpt, final)
    assert report["passed"] and report["published_to"] == final
    assert not os.path.exists(out)  # staged root was MOVED, not copied
    assert os.path.exists(os.path.join(final, "_AUDIT.json"))
    # the published corpus is the job's output, readable in place
    kept = spark.read.parquet(os.path.join(final, "filtered"))
    assert kept.count() == report["observed"]["rows"] > 0
    # publishing onto an existing version must refuse, not clobber
    import pytest as _pytest

    from data_quality_check_spark.pipeline.publish import publish_staged

    os.makedirs(out, exist_ok=True)
    with _pytest.raises(FileExistsError):
        publish_staged(out, final, report)


def test_curation_stages_ride_the_filter_pass(
    spark, fixture_paths, pipeline_out, tmp_path_factory
):
    """VERDICT r3 task 3: hash_split + mixture_sample + contamination_overlap
    wired into run_filter as options on the SAME commit-group pass.

    One run produces a filtered, deduped, contamination-checked, mixed, split
    corpus; the kept set and every split assignment are verified against an
    INDEPENDENT pandas/hashlib recomputation (pure functions of salt:id), and
    resume ≡ fresh under the same curation config."""
    import hashlib

    from data_quality_check_spark.operators.curation import (
        mixture_thresholds,
        split_thresholds,
    )

    _, path = fixture_paths
    default_out, _, _ = pipeline_out
    base = (
        spark.read.parquet(os.path.join(default_out, "filtered"))
        .select("image_id", "lang", "caption")
        .toPandas()
    )
    counts = base["lang"].value_counts().to_dict()

    # eval set = 12 verbatim kept captions → 100% shingle overlap, contaminated
    eval_caps = base.sort_values("image_id").head(12)
    eval_ids = set(eval_caps["image_id"])
    eval_path = str(tmp_path_factory.mktemp("evalset") / "eval.parquet")
    pd.DataFrame({"question": eval_caps["caption"].tolist()}).to_parquet(eval_path)

    weights = {lang: 1.0 for lang in counts}  # uniform target mix over observed langs
    out_rows = int(len(base) * 0.7)
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    cfg = FilterConfig(
        splits=splits,
        split_salt="exp1",
        mixture_weights=weights,
        mixture_output_rows=out_rows,
        mixture_counts=counts,
        mixture_salt="mix1",
        contamination_eval_path=eval_path,
        contamination_text_col="question",
        contamination_threshold_pct=50,
    )
    out = str(tmp_path_factory.mktemp("out_cur"))
    ckpt = str(tmp_path_factory.mktemp("ckpt_cur"))
    summary = run_filter(spark, path, out, ckpt, cfg)
    got = spark.read.parquet(os.path.join(out, "filtered")).toPandas()
    assert "split" in got.columns

    # independent expectation: default-kept ids, minus eval-contaminated ids
    # (exact-copy captions are ≥50% by construction; other fixture captions
    # draw from tiny per-lang vocabularies, so recompute overlap honestly with
    # the already-oracle-tested operator instead of assuming only exact hits),
    # minus mixture-dropped ids (pure hashlib recomputation)
    from data_quality_check_spark.operators.curation import contamination_overlap

    contam = {
        r.image_id
        for r in contamination_overlap(
            spark.read.parquet(path).select("image_id", "caption"),
            spark.read.parquet(eval_path).withColumnRenamed("question", "caption"),
            "image_id",
            "caption",
        )
        .filter(F.col("contaminated"))
        .collect()
    }
    assert eval_ids <= contam

    th = mixture_thresholds(counts, weights, out_rows)

    def mix_ok(row):
        t = th.get(row["lang"])
        key = hashlib.md5(f"mix1:{row['image_id']}".encode()).hexdigest()
        return t is not None and key < t

    expect = base[
        ~base["image_id"].isin(contam) & base.apply(mix_ok, axis=1)
    ]
    assert set(got["image_id"]) == set(expect["image_id"])
    assert summary["rows_kept"] == len(expect)
    # curation actually bit: both stages dropped someone, neither dropped all
    assert 0 < len(expect) < len(base)
    assert len(base[base["image_id"].isin(contam)]) >= 12

    # split assignments match the independent hashlib recomputation exactly
    sth = split_thresholds(splits)

    def want_split(image_id):
        key = hashlib.md5(f"exp1:{image_id}".encode()).hexdigest()
        for label, upper in sth:
            if key < upper:
                return label
        return list(splits)[-1]

    got_splits = dict(zip(got["image_id"], got["split"]))
    assert all(want_split(i) == s for i, s in got_splits.items())
    # and the realized mix is within loose binomial bounds of 80/10/10
    frac_train = (got["split"] == "train").mean()
    assert 0.7 < frac_train < 0.9

    # run_metrics carry per-split kept counts + the new drop reasons
    metrics = spark.read.parquet(os.path.join(ckpt, "run_metrics")).toPandas()
    for s in splits:
        assert metrics[f"split_{s}_kept"].sum() == (got["split"] == s).sum()
    assert metrics["n_contamination"].sum() > 0
    assert metrics["n_mixture"].sum() > 0

    # resume ≡ fresh under the same curation config
    out2 = str(tmp_path_factory.mktemp("out_cur2"))
    ckpt2 = str(tmp_path_factory.mktemp("ckpt_cur2"))
    run_filter(spark, path, out2, ckpt2, cfg, max_buckets=5)
    run_filter(spark, path, out2, ckpt2, cfg)
    a = got.sort_values("image_id").reset_index(drop=True)
    b = (
        spark.read.parquet(os.path.join(out2, "filtered"))
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        a[["image_id", "split", "scrubbed_caption"]],
        b[["image_id", "split", "scrubbed_caption"]],
    )


def test_curation_defaults_off_bit_identical(spark, fixture_paths, pipeline_out):
    """A default FilterConfig run must be unaffected by the curation additions:
    no contamination/mixture drops, no split column, reasons count zero."""
    _, ckpt, _ = pipeline_out
    metrics = spark.read.parquet(os.path.join(ckpt, "run_metrics")).toPandas()
    assert metrics["n_contamination"].sum() == 0
    assert metrics["n_mixture"].sum() == 0
    out, _, _ = pipeline_out
    assert "split" not in spark.read.parquet(os.path.join(out, "filtered")).columns


def test_mixture_requires_frozen_counts(spark, fixture_paths, tmp_path_factory):
    """The job never runs a counting pre-pass: mixture without frozen counts
    must refuse loudly at config time, not silently count."""
    _, path = fixture_paths
    cfg = FilterConfig(mixture_weights={"en": 1.0}, mixture_output_rows=10)
    with pytest.raises(ValueError, match="counting pre-pass"):
        run_filter(
            spark,
            path,
            str(tmp_path_factory.mktemp("o")),
            str(tmp_path_factory.mktemp("c")),
            cfg,
        )


def test_audit_rejects_impossible_gate_and_tampered_staging(spark, fixture_paths, tmp_path):
    import glob

    import pytest as _pytest

    from data_quality_check_spark.pipeline.publish import (
        AuditGates,
        PublishRejected,
        audit_and_publish,
        audit_staged,
    )

    _, path = fixture_paths
    out = str(tmp_path / "staged")
    ckpt = str(tmp_path / "ckpt")
    run_filter(spark, path, out, ckpt, FilterConfig())
    final = str(tmp_path / "published" / "v1")

    # an unmeetable keep-fraction gate: no publish, staged + final untouched
    with _pytest.raises(PublishRejected) as exc:
        audit_and_publish(
            spark, out, ckpt, final, gates=AuditGates(min_keep_fraction=0.999)
        )
    assert not os.path.exists(final) and os.path.exists(out)
    failed = [c["name"] for c in exc.value.report["checks"] if not c["passed"]]
    assert failed == ["keep_fraction_in_band"]

    # tamper: drop one staged data file → the manifest recount catches it
    victim = sorted(glob.glob(os.path.join(out, "filtered", "*", "*.parquet")))[0]
    os.remove(victim)
    report = audit_staged(spark, out, ckpt)
    bad = {c["name"] for c in report["checks"] if not c["passed"]}
    assert "staged_rows_match_manifest" in bad and not report["passed"]


def test_audit_read_error_is_a_failed_check_not_empty_corpus(spark, tmp_path):
    """ADVICE r3: a staged dir with DATA that cannot be read (corrupt footer,
    transient IO) must fail the `staged_readable` check carrying the error —
    never be conflated with a legitimately empty corpus, which with relaxed
    gates could otherwise publish a broken staging."""
    import pandas as pd

    from data_quality_check_spark.pipeline.publish import audit_staged

    ckpt = tmp_path / "ckpt" / "manifest"
    ckpt.mkdir(parents=True)
    pd.DataFrame(
        {"bucket": [0], "rows_in": [10], "rows_kept": [5],
         "run_id": ["r"], "committed_at": [pd.Timestamp.now(tz="UTC").as_unit("us")]}
    ).to_parquet(ckpt / "m.parquet")
    staged = tmp_path / "staged" / "filtered"
    staged.mkdir(parents=True)
    (staged / "part-00000.parquet").write_bytes(b"not a parquet file at all")
    rep = audit_staged(spark, str(tmp_path / "staged"), str(tmp_path / "ckpt"))
    assert not rep["passed"]
    by_name = {c["name"]: c for c in rep["checks"]}
    assert not by_name["staged_readable"]["passed"]
    assert by_name["staged_readable"]["observed"] != "ok"


def test_audit_reports_zero_keep_run_instead_of_crashing(spark, tmp_path):
    """A run that kept ZERO rows leaves an empty staged dir; the audit must
    return a structured rejection (min_rows_kept fails), not a schema
    inference crash."""
    import pandas as pd

    from data_quality_check_spark.pipeline.publish import audit_staged

    ckpt = tmp_path / "ckpt" / "manifest"
    ckpt.mkdir(parents=True)
    pd.DataFrame(
        {"bucket": [0], "rows_in": [10], "rows_kept": [0],
         "run_id": ["r"], "committed_at": [pd.Timestamp.now(tz="UTC").as_unit("us")]}
    ).to_parquet(ckpt / "m.parquet")
    (tmp_path / "staged" / "filtered").mkdir(parents=True)  # empty output
    rep = audit_staged(spark, str(tmp_path / "staged"), str(tmp_path / "ckpt"))
    assert not rep["passed"]
    failed = {c["name"] for c in rep["checks"] if not c["passed"]}
    assert "min_rows_kept" in failed and "staged_rows_match_manifest" not in failed


def test_decide_honors_contamination_config(
    spark, fixture_paths, pipeline_out, tmp_path_factory
):
    """The per-row decision API and run_filter must agree on EVERY FilterConfig
    option: decide() with contamination_eval_path set drops an
    otherwise-kept caption with reason 'contamination'. (Regression: decide()
    used to call finalize() without the contamination table, silently keeping
    rows run_filter would drop.)"""
    from data_quality_check_spark.pipeline.run import FilterConfig, decide

    _, path = fixture_paths
    default_out, _, _ = pipeline_out
    # an id the DEFAULT config keeps — contamination must be the only delta
    kept = (
        spark.read.parquet(os.path.join(default_out, "filtered"))
        .select("image_id", "caption")
        .orderBy("image_id")
        .limit(1)
        .collect()[0]
    )
    eval_path = str(tmp_path_factory.mktemp("evalset2") / "eval.parquet")
    pd.DataFrame({"question": [kept.caption]}).to_parquet(eval_path)

    cfg = FilterConfig(
        contamination_eval_path=eval_path,
        contamination_text_col="question",
        contamination_threshold_pct=50,
    )
    df = spark.read.parquet(path)
    row = {
        r.image_id: r
        for r in decide(df, cfg)
        .filter(F.col("image_id") == kept.image_id)
        .collect()
    }[kept.image_id]
    assert row.flag_contamination
    assert not row.keep and row.drop_reason == "contamination"


def test_prebucketed_layout_mismatch_refused(spark, tmp_path_factory):
    """A prebucketed input whose layout bucket count exceeds cfg.num_buckets
    must FAIL FAST, not silently skip the out-of-range buckets: pending =
    range(num_buckets), so bucket 4..7 rows of a B=8 layout would match no
    group filter and the run would report success over half the corpus."""
    from data_quality_check_spark.pipeline.fixtures import write_images_parquet_spark

    bdir = str(tmp_path_factory.mktemp("bucketed_wide"))
    write_images_parquet_spark(spark, bdir, n=200, num_files=8, bucket_by_id=8)
    out = str(tmp_path_factory.mktemp("out_mis"))
    ckpt = str(tmp_path_factory.mktemp("ckpt_mis"))
    with pytest.raises(ValueError, match="num_buckets"):
        run_filter(spark, bdir, out, ckpt, FilterConfig(num_buckets=4))
    # driver-side check → nothing staged, nothing committed
    assert not os.path.exists(os.path.join(ckpt, "manifest"))
    assert not os.path.exists(os.path.join(out, "filtered"))


def test_data_column_bucket_out_of_range_refused(spark, fixture_paths, tmp_path_factory):
    """Same hazard when `_bucket` is a plain data column (no partition dirs):
    the narrow fallback scan must catch out-of-range values before any work."""
    from data_quality_check_spark.pipeline.run import bucket_col

    _, path = fixture_paths
    wide = str(tmp_path_factory.mktemp("datacol") / "images8.parquet")
    (
        spark.read.parquet(path)
        .withColumn("_bucket", bucket_col(num_buckets=8))
        .write.parquet(wide)
    )
    out = str(tmp_path_factory.mktemp("out_dc"))
    ckpt = str(tmp_path_factory.mktemp("ckpt_dc"))
    with pytest.raises(ValueError, match="num_buckets"):
        run_filter(spark, wide, out, ckpt, FilterConfig(num_buckets=4))
    assert not os.path.exists(os.path.join(ckpt, "manifest"))


def test_ppl_mode_typo_rejected(spark, fixture_paths):
    """An unrecognized ppl_mode must raise, not silently run the fused path
    (which co-loads every per-language model per worker — the OOM the grouped
    mode exists to avoid)."""
    from data_quality_check_spark.pipeline.run import score_rows

    _, path = fixture_paths
    df = spark.read.parquet(path)
    for bad in ("Grouped", "groupped", ""):
        with pytest.raises(ValueError, match="ppl_mode"):
            score_rows(df, FilterConfig(ppl_mode=bad))


def test_overwrite_mode_restored_after_run(spark, fixture_paths, tmp_path_factory):
    """run_filter needs dynamic partition overwrite internally but must restore
    the caller's setting: leaking `dynamic` makes the caller's own later
    overwrite-partitionBy writes keep stale partitions silently."""
    _, path = fixture_paths
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "static")
    try:
        out = str(tmp_path_factory.mktemp("out_pom"))
        ckpt = str(tmp_path_factory.mktemp("ckpt_pom"))
        run_filter(spark, path, out, ckpt, FilterConfig(), max_buckets=2)
        assert spark.conf.get(key) == "static"
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_decide_gate_zero_matches_broadcast_path(spark, fixture_paths):
    """decide() must honor max_broadcast_decisions: with the gate at 0 the
    decisions join is un-hinted (shuffle join) yet verdict-identical to the
    broadcast path — previously finalize force-broadcast the full table no
    matter the config."""
    from data_quality_check_spark.pipeline.run import decide

    _, path = fixture_paths
    df = spark.read.parquet(path)
    cols = ["image_id", "keep", "drop_reason", "row_selected"]
    a = sorted(map(tuple, decide(df, FilterConfig()).select(*cols).collect()))
    b = sorted(
        map(
            tuple,
            decide(df, FilterConfig(max_broadcast_decisions=0)).select(*cols).collect(),
        )
    )
    assert a == b


def test_decide_honors_gopher_rules_config(spark, fixture_paths, pipeline_out):
    """Opt-in Gopher rules ride finalize: rows flagged by a selected rule and
    kept by everything higher-priority flip to drop_reason 'gopher'; rows the
    default config keeps and the rule does not flag are untouched; unknown
    rule names are rejected; default config emits a constant-false
    flag_gopher (bit-identical keep set)."""
    import pytest as _pt

    from data_quality_check_spark.pipeline.heuristics import gopher_flags
    from data_quality_check_spark.pipeline.run import FilterConfig, decide

    _, path = fixture_paths
    default_out, _, _ = pipeline_out
    default_kept = set(
        spark.read.parquet(os.path.join(default_out, "filtered"))
        .select("image_id")
        .toPandas()["image_id"]
    )

    df = spark.read.parquet(path)
    cfg = FilterConfig(gopher_rules=["flag_word_count"])
    rows = decide(df, cfg).select(
        "image_id", "keep", "drop_reason", "flag_gopher", "caption"
    ).collect()
    flagged_ids = {
        r["image_id"]
        for r in df.select(
            "image_id", list(gopher_flags(F.col("caption")).values())[0].alias("f")
        ).collect()
        if r["f"]
    }  # first key is flag_word_count (dict preserves insertion order)
    kept_now = {r.image_id for r in rows if r.keep}
    assert kept_now == default_kept - flagged_ids
    gopher_drops = {r.image_id for r in rows if r.drop_reason == "gopher"}
    assert gopher_drops and gopher_drops == (default_kept & flagged_ids)
    for r in rows:
        if r.keep:
            assert not r.flag_gopher

    with _pt.raises(ValueError, match="unknown gopher_rules"):
        decide(df, FilterConfig(gopher_rules=["flag_nope"])).collect()


def test_assign_aspect_buckets_rides_the_pass(
    spark, fixture_paths, pipeline_out, tmp_path_factory
):
    """Opt-in aspect_bucket output column: present iff configured, never NULL
    on kept rows (bad dims are already dropped), values equal an independent
    recomputation from the ladder, and the kept id set is bit-identical to
    the default run (the column is a projection, not a filter)."""
    from data_quality_check_spark.pipeline.heuristics import (
        ASPECT_LADDER,
        _ladder_milli,
    )
    from data_quality_check_spark.pipeline.run import FilterConfig, run_filter

    _, path = fixture_paths
    default_out, _, _ = pipeline_out
    out = str(tmp_path_factory.mktemp("out_ab"))
    ckpt = str(tmp_path_factory.mktemp("ckpt_ab"))
    run_filter(spark, path, out, ckpt, FilterConfig(assign_aspect_buckets=True))
    kept = spark.read.parquet(os.path.join(out, "filtered")).toPandas()
    assert "aspect_bucket" in kept.columns
    assert kept["aspect_bucket"].notna().all()

    base = spark.read.parquet(os.path.join(default_out, "filtered")).toPandas()
    assert "aspect_bucket" not in base.columns
    assert set(kept["image_id"]) == set(base["image_id"])

    milli = _ladder_milli(ASPECT_LADDER)

    def expect(w, h):
        ar = (int(w) * 1000) // int(h)
        return min(range(len(milli)), key=lambda i: (abs(ar - milli[i]), i))

    recomputed = kept.apply(lambda r: expect(r["w"], r["h"]), axis=1)
    assert (kept["aspect_bucket"] == recomputed).all()


def test_decision_eval_operator_agrees_with_python_f1(spark, golden, pipeline_out):
    """The distributed decision_eval operator, fed the pipeline's keep
    decisions against the golden labels, must reproduce the pandas-side
    confusion arithmetic of test_keep_f1_and_caption_equality exactly — the
    north rule's F1 measurement as an operator, closed against its
    independent recomputation."""
    from data_quality_check_spark.operators.curation import decision_eval

    out, _, _ = pipeline_out
    kept_ids = {
        r["image_id"]
        for r in spark.read.parquet(os.path.join(out, "filtered"))
        .select("image_id")
        .collect()
    }
    g = golden.drop_duplicates(subset=["image_id"])
    rows = [
        (iid, iid in kept_ids, bool(keep))
        for iid, keep in zip(g["image_id"], g["keep"])
    ]
    df = spark.createDataFrame(rows, ["image_id", "pred", "label"])
    ev = decision_eval(df, "pred", "label").collect()[0].asDict()

    want_ids = set(g[g["keep"]]["image_id"])
    tp = len(kept_ids & want_ids)
    fp = len(kept_ids - want_ids)
    fn = len(want_ids - kept_ids)
    assert (ev["tp"], ev["fp"], ev["fn"]) == (tp, fp, fn)
    assert ev["n_unlabeled"] == 0
    assert ev["f1"] == 1.0  # same kernels both sides — exact agreement


def test_f1_publish_gate_blocks_mistuned_run_and_promotes_good(
    spark, fixture_paths, golden, tmp_path
):
    """VERDICT r4 task 2: the north rule's F1 >= 0.99 acceptance bar enforced
    at DEPLOY time through the WAP audit (AuditGates.min_f1 + labels_path,
    scored by operators.curation.decision_eval): a mis-tuned FilterConfig
    stages, fails the F1 gate, and leaves final untouched; the good config
    promotes with the full confusion cells in the audit report."""
    from data_quality_check_spark.pipeline.publish import (
        AuditGates,
        PublishRejected,
        audit_and_publish,
    )

    _, path = fixture_paths
    labels_path = str(tmp_path / "labels.parquet")
    golden.drop_duplicates(subset=["image_id"])[["image_id", "keep"]].to_parquet(
        labels_path
    )
    # keep-fraction band opened wide so the F1 gate is provably what blocks
    gates = AuditGates(min_f1=0.99, labels_path=labels_path, min_keep_fraction=0.0)
    final = str(tmp_path / "published" / "v1")

    # config error surfaced, never silently skipped
    with pytest.raises(ValueError, match="labels_path"):
        audit_and_publish(spark, "x", "y", final, gates=AuditGates(min_f1=0.99))

    # mis-tuned: keeping only one language diverges from the reference labels
    bad_out, bad_ckpt = str(tmp_path / "bad_staged"), str(tmp_path / "bad_ckpt")
    run_filter(spark, path, bad_out, bad_ckpt, FilterConfig(target_langs=["fr"]))
    with pytest.raises(PublishRejected) as ei:
        audit_and_publish(spark, bad_out, bad_ckpt, final, gates=gates)
    failed = {c["name"] for c in ei.value.report["checks"] if not c["passed"]}
    assert failed == {"min_keep_f1"}  # the F1 gate alone blocked it
    f1_check = next(
        c for c in ei.value.report["checks"] if c["name"] == "min_keep_f1"
    )
    assert f1_check["observed"]["f1"] < 0.99
    assert f1_check["observed"]["fn"] > 0  # non-fr keeps became false negatives
    assert not os.path.exists(final)  # final untouched
    assert os.path.exists(os.path.join(bad_out, "filtered"))  # staged intact

    # good config under the SAME gates: promotes, and agreement is exact
    good_out, good_ckpt = str(tmp_path / "good_staged"), str(tmp_path / "good_ckpt")
    run_filter(spark, path, good_out, good_ckpt, FilterConfig())
    report = audit_and_publish(spark, good_out, good_ckpt, final, gates=gates)
    assert report["passed"] and report["published_to"] == final
    f1_check = next(c for c in report["checks"] if c["name"] == "min_keep_f1")
    assert f1_check["passed"]
    assert f1_check["observed"]["f1"] == 1.0
    assert f1_check["observed"]["fp"] == 0 and f1_check["observed"]["fn"] == 0
    assert f1_check["observed"]["n_unlabeled"] == 0


def test_strict_alpha_class_flips_dimension_spam_default_unchanged(spark):
    """VERDICT r4 task 6: ALPHA_CLASS_STRICT excludes the two math signs
    (U+00D7 ×, U+00F7 ÷) the default class deliberately keeps for
    reference-parity label stability. Dimension-spam captions flip
    flag_low_alpha under strict mode only; default labels are bit-unchanged;
    the DuckDB twin agrees under both modes."""
    import duckdb

    from data_quality_check_spark.pipeline.heuristics import (
        ALPHA_CHARS,
        ALPHA_CHARS_STRICT,
        caption_flags,
        caption_flags_sql,
    )

    assert "×" in ALPHA_CHARS and "÷" in ALPHA_CHARS
    assert "×" not in ALPHA_CHARS_STRICT and "÷" not in ALPHA_CHARS_STRICT
    assert len(ALPHA_CHARS_STRICT) == len(ALPHA_CHARS) - 2
    # the regex class and its translate-chars complement are maintained as a
    # PAIR (the 45x-cheaper translate trick rests on them agreeing): pin the
    # complement relationship over the whole Latin-1 range, both modes
    import re

    from data_quality_check_spark.pipeline.heuristics import (
        ALPHA_CLASS,
        ALPHA_CLASS_STRICT,
    )

    latin1 = [chr(i) for i in range(0x20, 0x100)]
    for cls, chars in ((ALPHA_CLASS, ALPHA_CHARS), (ALPHA_CLASS_STRICT, ALPHA_CHARS_STRICT)):
        rx = re.compile(cls)
        assert {c for c in latin1 if not rx.match(c)} == set(chars), cls

    spam = "× ÷ ×× ÷÷ ××× ÷÷÷ 1×1"
    caps = [
        (1, spam),                               # dimension spam: mostly x/÷ signs
        (2, "a normal caption about a dog"),     # plain text: fine under both
        (3, "@@@@ %%%% ####"),                   # junk: flagged under both
        (4, None),                               # NULL: False under both (nvl)
        (5, "800×600 wallpaper of a sunset"),  # mild use: fine under both
    ]
    pdf = pd.DataFrame(caps, columns=["id", "caption"])
    df = spark.createDataFrame(pdf)
    got = df.select(
        "id",
        caption_flags(F.col("caption"))["flag_low_alpha"].alias("dflt"),
        caption_flags(F.col("caption"), strict_alpha=True)["flag_low_alpha"].alias(
            "strict"
        ),
    ).collect()
    by_id = {r.id: (r.dflt, r.strict) for r in got}
    assert by_id[1] == (False, True)  # spam flips under strict ONLY
    assert by_id[2] == (False, False)
    assert by_id[3] == (True, True)
    assert by_id[4] == (False, False)
    assert by_id[5] == (False, False)

    # DuckDB twin parity in BOTH modes
    con = duckdb.connect()
    con.register("caps", pdf)
    for mode, col in ((False, "dflt"), (True, "strict")):
        expr = caption_flags_sql("caption", strict_alpha=mode)["flag_low_alpha"]
        want = dict(con.execute(f"SELECT id, {expr} FROM caps").fetchall())
        for i, pair in by_id.items():
            assert bool(want[i]) == pair[1 if mode else 0], (mode, i)
    con.close()


def test_ppl_bucket_labels_ride_the_pass(
    spark, fixture_paths, pipeline_out, tmp_path_factory
):
    """VERDICT r4 task 3: frozen per-language perplexity-bucket labels (the
    CCNet head/middle/tail shape) as an opt-in FilterConfig column riding the
    same pass. Kept set invariant vs the default run; labels identical to
    curation.apply_bucket_thresholds on the same cuts (shared
    bucket_label_col); config validation errors surface."""
    from data_quality_check_spark.operators.curation import (
        apply_bucket_thresholds,
        bucket_thresholds,
    )
    from data_quality_check_spark.pipeline.run import output_schema_fingerprint

    _, path = fixture_paths
    default_out, _, _ = pipeline_out
    base = spark.read.parquet(os.path.join(default_out, "filtered"))
    # the production loop: calibrate cuts once from a prior run's kept rows,
    # freeze them into the config
    th = bucket_thresholds(base, F.col("ppl"), "lang", n=3)
    cuts = {r["lang"]: [float(c) for c in r["cuts"]] for r in th.collect()}
    assert len(cuts) >= 2  # multi-language calibration actually exercised

    out = str(tmp_path_factory.mktemp("pplbkt"))
    cfg = FilterConfig(ppl_bucket_cuts=cuts)
    run_filter(spark, path, os.path.join(out, "d"), os.path.join(out, "c"), cfg)
    labeled = spark.read.parquet(os.path.join(out, "d", "filtered"))

    # kept set invariance: labeling must not perturb a single verdict
    got_ids = sorted(r["image_id"] for r in labeled.select("image_id").collect())
    want_ids = sorted(r["image_id"] for r in base.select("image_id").collect())
    assert got_ids == want_ids

    # label parity with apply_bucket_thresholds on the SAME cuts
    want = apply_bucket_thresholds(base, F.col("ppl"), "lang", th).select(
        "image_id", F.col("bucket").alias("want")
    )
    joined = labeled.select("image_id", "ppl_bucket").join(want, "image_id")
    assert joined.count() == len(want_ids)
    assert (
        joined.filter(~F.col("ppl_bucket").eqNullSafe(F.col("want"))).count() == 0
    )
    # every kept row's lang was calibrated -> no NULL labels, all 3 present
    assert labeled.filter(F.col("ppl_bucket").isNull()).count() == 0
    present = {r["ppl_bucket"] for r in labeled.select("ppl_bucket").distinct().collect()}
    assert present == {"head", "middle", "tail"}

    # schema facet: the column's presence + label alphabet fingerprint; the
    # frozen cut VALUES don't (verdict-facet, same rule as filter thresholds)
    fp_on = output_schema_fingerprint(cfg)
    assert fp_on["ppl_bucket_labels"] == ["head", "middle", "tail"]
    assert output_schema_fingerprint(FilterConfig())["ppl_bucket_labels"] == []
    cuts2 = {k: [c * 1.0 for c in v] for k, v in cuts.items()}
    assert output_schema_fingerprint(FilterConfig(ppl_bucket_cuts=cuts2)) == fp_on

    # config validation: wrong cut count / non-ascending cuts are refused
    from data_quality_check_spark.pipeline.run import optional_out_cols

    with pytest.raises(ValueError, match="labels need exactly"):
        optional_out_cols(base, FilterConfig(ppl_bucket_cuts={"en": [1.0]}), [])
    with pytest.raises(ValueError, match="ascending"):
        optional_out_cols(
            base, FilterConfig(ppl_bucket_cuts={"en": [9.0, 1.0]}), []
        )


def test_fingerprint_missing_key_reads_as_default(tmp_path):
    """A checkpoint fingerprint written by pre-upgrade code lacks later-added
    facets; resuming with an unchanged (default-off) config must be accepted —
    the missing key reads as its pre-upgrade default — while a real facet
    change still refuses."""
    import json

    from data_quality_check_spark.pipeline.run import (
        _check_output_schema_fingerprint,
    )

    ckpt = str(tmp_path / "ckpt")
    os.makedirs(ckpt)
    # the r4-era fingerprint shape: no ppl_bucket_labels key
    with open(os.path.join(ckpt, "output_schema.json"), "w") as f:
        json.dump({"split_labels": [], "assign_aspect_buckets": False}, f)
    _check_output_schema_fingerprint(ckpt, FilterConfig())  # no raise
    with pytest.raises(ValueError, match="output-schema config changed"):
        _check_output_schema_fingerprint(
            ckpt, FilterConfig(ppl_bucket_cuts={"en": [1.0, 2.0]})
        )


def test_f1_gate_label_duplicates_and_contradictions(spark, tmp_path):
    """Duplicate label rows must not double-count confusion cells: exact
    repeats collapse to one vote; contradictory repeats (keep AND drop for one
    id) become n_unlabeled — missing evidence, not a coin flip."""
    from data_quality_check_spark.pipeline.publish import AuditGates, _f1_check

    staged = spark.createDataFrame([("a",), ("b",)], "image_id string")
    labels_path = str(tmp_path / "labels.parquet")
    pd.DataFrame(
        {
            "image_id": ["a", "a", "b", "c", "d", "d"],
            "keep": [True, True, True, False, True, False],
        }
    ).to_parquet(labels_path)
    gates = AuditGates(min_f1=0.99, labels_path=labels_path)
    check = _f1_check(spark, staged, gates)
    obs = check["observed"]
    # a: dup exact keep labels -> ONE tp; b: tp; c: tn; d: contradictory -> unlabeled
    assert obs["tp"] == 2 and obs["tn"] == 1 and obs["fp"] == 0 and obs["fn"] == 0
    assert obs["n_unlabeled"] == 1
    assert check["passed"] and obs["f1"] == 1.0
