"""Dedup / similarity / textstats / multimodal / streaming operators."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from wikitfidf_spark.operators import dedup, similarity, multimodal
from wikitfidf_spark.operators.termstats import term_frequencies
from wikitfidf_spark.streaming import jobs as stream_jobs


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    rows = [
        (1, "alpha beta gamma delta common tokens here"),
        (2, "alpha beta gamma delta common tokens here"),     # exact dup of 1
        (3, "alpha beta gamma delta common tokens nearby"),   # near dup
        (4, "totally different content words appear once"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs_with_dups):
    groups = {r["keep_id"]: r["n_dups"] for r in dedup.exact_dup_groups(docs_with_dups).collect()}
    assert groups == {1: 2, 3: 1, 4: 1}
    kept = {r["doc_id"] for r in dedup.dedup_exact(docs_with_dups).collect()}
    assert kept == {1, 3, 4}


def test_connected_components_clusters_transitive_groups(spark):
    """A~B, B~C must land in ONE component labeled min(doc_id) even
    though A~C was never emitted as a pair; disjoint pairs stay
    separate; docs absent from the pair table get no row (nothing to
    cluster); a long chain still converges (diameter > 2)."""
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3),            # transitive group {1,2,3} -> comp 1
         (10, 11),                  # separate group -> comp 10
         (20, 21), (21, 22), (22, 23), (23, 24)],  # chain, diameter 4
        "a long, b long",
    )
    got = {
        r["doc_id"]: r["component_id"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20, 23: 20, 24: 20,
    }
    with pytest.raises(ValueError, match="max_iter"):
        dedup.connected_components(pairs, max_iter=0)
    # a diameter-4 chain cannot converge in 1 round — must raise, not
    # silently return partially-propagated labels
    chain = spark.createDataFrame(
        [(20, 21), (21, 22), (22, 23), (23, 24)], "a long, b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(chain, max_iter=1)


def test_minhash_finds_near_dups(spark, docs_with_dups):
    tf = term_frequencies(docs_with_dups, text="text")
    pairs = {(r["a"], r["b"]) for r in dedup.minhash_candidates(tf).collect()}
    assert (1, 2) in pairs  # identical token sets share every band
    j = dedup.jaccard_on_pairs(
        spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "a long, b long"), tf
    ).collect()
    by_pair = {(r["a"], r["b"]): r for r in j}
    assert by_pair[(1, 2)]["jaccard"] == 1.0
    assert 0.5 < by_pair[(1, 3)]["jaccard"] < 1.0
    assert (1, 4) not in by_pair  # zero shared terms -> drops out (jaccard 0)


def test_minhash_shingle_selectivity_and_recall(spark):
    """The retuned LSH (3-token shingles, 16 hashes × 4 rows/band) must
    (a) recall 100% of the planted exact-duplicate pairs — identical
    shingle sets collide on every band — and (b) emit candidates that
    are a small fraction of n²/2, i.e. the banding is selective instead
    of degenerating to all-pairs (the round-1 defect)."""
    from wikitfidf_spark.corpus import make_code_files_pdf, DUP_EVERY

    n = 400
    pdf = make_code_files_pdf(n_docs=n, seed=3)
    pdf.insert(0, "doc_id", range(n))
    docs = spark.createDataFrame(pdf[["doc_id", "content"]]).withColumnRenamed(
        "content", "text"
    )
    sh = dedup.shingle_sets(docs)
    pairs = {(r["a"], r["b"]) for r in dedup.minhash_candidates(sh).collect()}
    planted = {(i - 7, i) for i in range(n) if i % DUP_EVERY == DUP_EVERY - 1 and i >= 7}
    assert planted <= pairs, f"missed planted dups: {planted - pairs}"
    assert len(pairs) < 0.01 * n * (n - 1) / 2, f"non-selective: {len(pairs)} candidates"


def test_shingles_drop_tokenless_docs(spark):
    """Docs with zero tokens (nothing matches the >=3-char grammar) must
    vanish from the shingle sets — otherwise they'd all share the
    empty-string shingle and become mutual near-dup candidates (and the
    SQL oracle, whose empty slice yields NULL, would disagree)."""
    docs = spark.createDataFrame(
        [(1, "a = b + c"), (2, "alpha beta gamma"), (3, "x | y")],
        "doc_id long, text string",
    )
    sh = dedup.shingle_sets(docs)
    assert {r["doc_id"] for r in sh.collect()} == {2}
    assert dedup.minhash_candidates(sh).count() == 0


def test_simhash_similarity(spark, docs_with_dups):
    tf = term_frequencies(docs_with_dups, text="text")
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(tf).collect()}
    assert sh[1] == sh[2]  # identical docs -> identical fingerprint
    ham_near = bin(sh[1] ^ sh[3]).count("1")
    ham_far = bin(sh[1] ^ sh[4]).count("1")
    assert ham_near <= ham_far


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(11)
    base = rng.randn(40, 16)
    base[1] = base[0] + 0.01 * rng.randn(16)  # vec 1 ~ vec 0
    rows = [(i, base[i].tolist()) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_bruteforce_vs_numpy(spark, vectors):
    got = [(r["vec_id"], r["cos"]) for r in similarity.cosine_topk_bruteforce(vectors, 0, 5).collect()]
    m = np.array([r["embedding"] for r in vectors.orderBy("vec_id").collect()])
    q = m[0]
    dots = np.floor(m * q * similarity.DOT_QUANT + 0.5).sum(axis=1)
    norms = np.floor(m * m * similarity.DOT_QUANT + 0.5).sum(axis=1)
    cos = dots / (np.sqrt(norms) * np.sqrt(norms[0]))
    cos = np.floor(cos * 1e6 + 0.5) / 1e6
    order = sorted(((c, i) for i, c in enumerate(cos) if i != 0), key=lambda t: (-t[0], t[1]))[:5]
    assert got == [(i, c) for c, i in order]
    assert got[0][0] == 1  # the planted neighbour wins


def test_cosine_arrow_matches_bruteforce(spark, vectors):
    q = np.array(vectors.filter(F.col("vec_id") == 0).collect()[0]["embedding"])
    arrow = [(r["vec_id"], r["cos"]) for r in similarity.cosine_topk_arrow(vectors.filter("vec_id != 0"), q, 5).collect()]
    brute = [(r["vec_id"], r["cos"]) for r in similarity.cosine_topk_bruteforce(vectors, 0, 5).collect()]
    assert arrow == brute


def test_lsh_bucket_contains_self_neighbour(spark, vectors):
    got = [r["vec_id"] for r in similarity.cosine_topk_lsh(vectors, 0, 5).collect()]
    assert 1 in got  # near-identical vector lands in the same bucket


def test_ivf_topk_probes_cells(spark, vectors):
    """IVF-flat: the planted near-duplicate shares the query's cell (a
    near-identical vector has a near-identical quantizer objective), and
    every returned cosine equals the exact brute-force value — cells
    only restrict the candidate set, never change scores."""
    ivf = similarity.cosine_topk_ivf(vectors, 0, 5, n_cells=4, nprobe=2).collect()
    assert 1 in [r["vec_id"] for r in ivf]
    brute = {
        r["vec_id"]: r["cos"]
        for r in similarity.cosine_topk_bruteforce(vectors, 0, 40).collect()
    }
    for r in ivf:
        assert brute[r["vec_id"]] == r["cos"]


def test_cosine_pairs_exact_finds_planted_pair(spark, vectors):
    pairs = similarity.cosine_pairs_exact(vectors, threshold=0.99).collect()
    assert (0, 1) in [(r["id_a"], r["id_b"]) for r in pairs]
    for r in pairs:
        assert r["id_a"] < r["id_b"] and r["cos"] >= 0.99


def test_cosine_pairs_lsh_subset_of_exact(spark, vectors):
    exact = {(r["id_a"], r["id_b"], r["cos"])
             for r in similarity.cosine_pairs_exact(vectors, threshold=0.5).collect()}
    lsh = {(r["id_a"], r["id_b"], r["cos"])
           for r in similarity.cosine_pairs_lsh(vectors, threshold=0.5, n_planes=4).collect()}
    assert lsh <= exact          # candidates are verified with the same exact cosine
    assert (0, 1) in {(a, b) for a, b, _ in lsh}  # planted near-dup shares the bucket


def test_cosine_pairs_exact_guard(spark, vectors):
    """The all-pairs anchor refuses to run above max_rows — the O(n²)
    plan must not be invocable at scale by accident; the error points
    at the banded LSH path."""
    with pytest.raises(ValueError, match="cosine_pairs_lsh"):
        similarity.cosine_pairs_exact(vectors, threshold=0.5, max_rows=10)
    # explicit opt-out still works
    forced = similarity.cosine_pairs_exact(vectors, threshold=0.99, max_rows=None).collect()
    assert (0, 1) in [(r["id_a"], r["id_b"]) for r in forced]


def test_cosine_pairs_exact_guard_count_memoized(spark, vectors):
    """The guard's count job runs ONCE per DataFrame object: repeated
    guarded calls hit the weak-key memo, and an n_rows hint skips the
    action entirely (asserted by counting Spark jobs via statusTracker)."""
    tracker = spark.sparkContext.statusTracker()
    similarity.cosine_pairs_exact(vectors, threshold=0.5)  # memo warm
    # plan twice more WITHOUT executing: no new count job may launch
    n_jobs_before = max([0, *(tracker.getJobIdsForGroup() or [])])
    similarity.cosine_pairs_exact(vectors, threshold=0.6)
    similarity.cosine_pairs_exact(vectors, threshold=0.7)
    n_jobs_after = max([0, *(tracker.getJobIdsForGroup() or [])])
    assert n_jobs_after == n_jobs_before, "guard count re-ran despite memo"
    # n_rows hint: guard fires without any job even on a fresh DataFrame
    fresh = vectors.select("vec_id", "embedding")
    with pytest.raises(ValueError, match="cosine_pairs_lsh"):
        similarity.cosine_pairs_exact(fresh, threshold=0.5, max_rows=10, n_rows=11)
    assert max([0, *(tracker.getJobIdsForGroup() or [])]) == n_jobs_after


def test_banded_lsh_recall_on_planted_near_dups(spark):
    """Banded near-dup LSH recall, quantified on PLANTED pairs (the
    embedding analogue of corpus.py's DUP_EVERY): 400 background
    vectors + 50 planted pairs with cosine in [0.62, 0.95].  With
    P=12 planes x R=100 bands the per-pair candidate probability is
    1-(1-p^12)^100 (p = 1-θ/π) ≈ 0.97 at cos 0.62 and ~1 above —
    asserted ≥ 0.9 — while candidates stay far below n²/2 (the whole
    point of banding over a single table, whose recall at this
    operating point would be p^12 ≈ 3%)."""
    rng = np.random.RandomState(42)
    d, n_bg, n_plant = 64, 400, 50
    bg = rng.randn(n_bg, d)
    bases = rng.randn(n_plant, d)
    targets = np.linspace(0.62, 0.95, n_plant)
    partners = []
    for i, t in enumerate(targets):
        b = bases[i] / np.linalg.norm(bases[i])
        r = rng.randn(d)
        r -= (r @ b) * b
        r /= np.linalg.norm(r)
        v = t * b + np.sqrt(1 - t * t) * r
        partners.append(v * np.linalg.norm(bases[i]))
    m = np.vstack([bg, bases, np.array(partners)])
    n = len(m)
    vecs = spark.createDataFrame(
        [(i, m[i].tolist()) for i in range(n)], "vec_id long, embedding array<double>"
    )
    planted = {(n_bg + i, n_bg + n_plant + i) for i in range(n_plant)}

    found = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_pairs_lsh(
            vecs, threshold=0.6, n_planes=12, n_bands=100
        ).collect()
    }
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, f"banded LSH recall {recall} < 0.9 on planted near-dups"

    # candidate volume: threshold=-1 keeps every candidate through the
    # verify kernel -> the output IS the candidate set
    candidates = similarity.cosine_pairs_lsh(
        vecs, threshold=-1.0, n_planes=12, n_bands=100
    ).count()
    all_pairs = n * (n - 1) // 2
    assert candidates < 0.10 * all_pairs, (
        f"banding lost selectivity: {candidates} candidates vs {all_pairs} pairs"
    )
    # cross-band dedup: each candidate pair is verified exactly once
    assert len(found) == len(set(found))


def test_multimodal_plumbing(spark, docs_with_dups):
    media = multimodal.attach_binary_payload(docs_with_dups)
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 4
    for r in feats:
        src = [x for x in docs_with_dups.collect() if x["doc_id"] == r["doc_id"]][0]
        payload = src["text"].encode()
        assert r["n_bytes"] == len(payload)
        assert r["payload_sha256"] == hashlib.sha256(payload).hexdigest()
        assert len(r["features"]) == multimodal.FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in r["features"])


def test_multimodal_resize_and_frame_sampling(spark, docs_with_dups):
    """Resize + frame-sample plumbing: deterministic stand-ins behind
    production Spark shape (Arrow batches, binary columns, one-to-many
    frame fan-out with stable indices)."""
    media = multimodal.attach_binary_payload(docs_with_dups)
    rs = {r["doc_id"]: r for r in multimodal.resize_payload(media, target_bytes=10).collect()}
    assert len(rs) == 4
    for did, r in rs.items():
        src = [x for x in docs_with_dups.collect() if x["doc_id"] == did][0]
        expected = src["text"].encode()[:10].ljust(10, b"\x00")
        assert bytes(r["payload"]) == expected and r["n_bytes"] == 10
        assert r["media_meta"]["mime"] == "application/x-fake-resized"

    frames = multimodal.sample_frames(media, frame_bytes=8, every_n=2).collect()
    by_doc: dict = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    src1 = [x for x in docs_with_dups.collect() if x["doc_id"] == 1][0]["text"].encode()
    got1 = sorted(by_doc[1], key=lambda r: r["frame_idx"])
    # ceil: the trailing partial frame is sampled too (short tail frame)
    n_frames = max(1, -(-len(src1) // 8))
    assert [r["frame_idx"] for r in got1] == list(range(0, n_frames, 2))
    for r in got1:
        j = r["frame_idx"]
        assert bytes(r["frame"]) == src1[j * 8:(j + 1) * 8]


def test_streaming_parity_with_batch(spark, tmp_path):
    """readStream + availableNow + memory sink == batch plan."""
    batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    expected = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in stream_jobs.windowed_counts(batch).collect()
    }
    # streaming parquet source requires a directory
    import shutil

    src_dir = tmp_path / "events_stream"
    src_dir.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src_dir / "part-0.parquet")
    sdf = stream_jobs.stream_windowed_counts(spark, str(src_dir))
    out = stream_jobs.run_stream_to_memory(spark, sdf, "t_win")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in out.collect()
    }
    assert got == expected


def test_stream_trending_terms_parity(spark, tmp_path):
    """Streaming watermarked windowed term counts + batch top-k
    finisher == the same plan run fully batch, over a deterministic
    timestamped document stream (ts derived from doc_id)."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(
            "doc_id",
            F.timestamp_seconds(
                F.lit(1_700_000_000) + (F.col("doc_id") % 8) * 1800
            ).alias("ts"),
            "text",
        )
    )
    batch_counts = stream_jobs.trending_term_counts(docs, window="1 hour")
    expected = sorted(
        (r["window_start"], r["rank"], r["term"], r["n"])
        for r in stream_jobs.topk_terms_per_window(batch_counts, k=5).collect()
    )

    src_dir = tmp_path / "docs_stream"
    src_dir.mkdir()
    docs.write.parquet(str(src_dir), mode="overwrite")
    sdf = stream_jobs.stream_trending_terms(spark, str(src_dir), window="1 hour")
    sink = stream_jobs.run_stream_to_memory(spark, sdf, "t_trend")
    got = sorted(
        (r["window_start"], r["rank"], r["term"], r["n"])
        for r in stream_jobs.topk_terms_per_window(sink, k=5).collect()
    )
    assert got == expected and len(got) > 0
    # 4 distinct hour windows (8 half-hour offsets folded pairwise), 5 terms each
    assert len({w for w, *_ in got}) == 4
    assert all(1 <= rank <= 5 for _, rank, _, _ in got)


def test_stream_dedup_matches_batch_distinct(spark, tmp_path):
    """withWatermark + dropDuplicates over a finite source must equal
    the batch distinct on the same keys (single availableNow trigger ->
    state spans the whole input)."""
    import shutil

    src_dir = tmp_path / "events_dedup_stream"
    src_dir.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src_dir / "part-0.parquet")
    batch = {
        (r["user_id"], r["event_type"], r["ts"])
        for r in stream_jobs.dedup_events(
            spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        ).collect()
    }
    sdf = stream_jobs.stream_dedup_events(spark, str(src_dir))
    got = {
        (r["user_id"], r["event_type"], r["ts"])
        for r in stream_jobs.run_stream_to_memory(spark, sdf, "t_dedup", "append").collect()
    }
    assert got == batch and len(got) > 0


def _events_stream_dir(tmp_path):
    import shutil

    src_dir = tmp_path / "events_sess_stream"
    src_dir.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src_dir / "part-0.parquet")
    return str(src_dir)


def test_stream_sessionize_builtin_closed_sessions_match_batch(spark, tmp_path):
    """session_window streaming (watermark 0s): every emitted session is
    finalized and must equal the batch sessionize row for that
    (user, start)."""
    batch = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in stream_jobs.sessionize(
            spark.read.parquet("/root/testdata/sf0.001/events.parquet"), 30
        ).collect()
    }
    sdf = stream_jobs.stream_sessionize(spark, _events_stream_dir(tmp_path), 30)
    got = stream_jobs.run_stream_to_memory(spark, sdf, "t_sess_bi", "append").collect()
    assert got, "watermark 0s should finalize most sessions"
    for r in got:
        key = (r["user_id"], r["session_start"])
        assert key in batch
        end, n = batch[key]
        assert (r["session_end"], r["n_events"]) == (end, n)


def test_stream_sessionize_stateful_watermark_finalized(spark, tmp_path):
    """applyInPandasWithState sessionizer emits EXACTLY the sessions the
    final watermark can prove closed (session_end + gap strictly before
    max_ts - delay), value- and session_id-identical to the batch plan —
    never early (a late event inside the watermark could still extend
    or merge a session)."""
    import datetime as dt

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = stream_jobs.sessionize(events, 30).collect()
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    wm = max_ts - dt.timedelta(hours=2)  # watermark delay below
    gap = dt.timedelta(minutes=30)
    expected = {
        (r["user_id"], r["session_id"]): (r["session_start"], r["session_end"], r["n_events"])
        for r in rows
        if r["session_end"] + gap < wm  # strict: ts == wm is still admitted
    }
    sdf = stream_jobs.stream_sessionize_stateful(
        spark, _events_stream_dir(tmp_path), 30, watermark="2 hours"
    )
    got = {
        (r["user_id"], r["session_id"]): (r["session_start"], r["session_end"], r["n_events"])
        for r in stream_jobs.run_stream_to_memory(spark, sdf, "t_sess_st", "append").collect()
    }
    assert got == expected and len(got) > 0


def test_stream_sessionize_stateful_late_event_merges(spark, tmp_path):
    """Multi-batch late data: an event arriving in batch 2 that falls
    inside an earlier (not-yet-finalized) session window must merge into
    it — emission waits for the watermark, so nothing is emitted early
    or contradicts the batch result."""
    import time as _time

    def write_batch(name, rows):
        pdf = spark.createDataFrame(
            [(i, ts, 1, "e", 0.0, None) for i, ts in enumerate(rows)],
            stream_jobs.EVENTS_SCHEMA,
        )
        pdf.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "staging" / name))
        import glob as _glob
        import shutil as _shutil

        (tmp_path / "late_src").mkdir(exist_ok=True)
        src = _glob.glob(str(tmp_path / "staging" / name / "part-*.parquet"))[0]
        _shutil.copy(src, tmp_path / "late_src" / f"{name}.parquet")
        _time.sleep(1.1)  # distinct mtimes -> deterministic file order

    import datetime as dt

    t0 = dt.datetime(2024, 3, 1, 10, 0, 0)
    m = lambda mins: t0 + dt.timedelta(minutes=mins)
    write_batch("b1", [m(0), m(60)])                    # 10:00, 11:00
    write_batch("b2", [m(15), m(180), m(780)])          # late 10:15; 13:00; 23:00

    sdf = stream_jobs.stream_sessionize_stateful(
        spark, str(tmp_path / "late_src"), 30, watermark="1 hour",
        max_files_per_trigger=1,
    )
    got = sorted(
        (r["session_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in stream_jobs.run_stream_to_memory(spark, sdf, "t_sess_late", "append").collect()
    )
    # all events; final watermark = 23:00 - 1h = 22:00; gap 30min:
    # sessions [10:00-10:15](2) [11:00](1) [13:00](1) finalized; [23:00] open
    assert got == [
        (1, m(0), m(15), 2),
        (2, m(60), m(60), 1),
        (3, m(180), m(180), 1),
    ]


def test_term_cooccurrence_pmi(spark):
    """PMI vs a hand-computed oracle on a 4-doc corpus."""
    import math

    from wikitfidf_spark.operators import textstats

    rows = [
        (1, "target alpha beta"),
        (2, "target alpha gamma"),
        (3, "target beta gamma"),
        (4, "alpha beta gamma"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    tf = term_frequencies(docs, text="text")
    got = {
        r["term"]: (r["n_ab"], r["n_a"], r["n_b"], r["pmi_q"])
        for r in textstats.term_cooccurrence(tf, "target", min_pair_docs=2).collect()
    }
    # n_docs=4, n_a=3; alpha: n_ab=2, n_b=3; beta: 2,3; gamma: 2,3
    pmi = math.floor(math.log((2 * 4) / (3 * 3)) * 1e6 + 0.5) / 1e6
    assert got == {
        "alpha": (2, 3, 3, pmi),
        "beta": (2, 3, 3, pmi),
        "gamma": (2, 3, 3, pmi),
    }


def test_term_cooccurrence_min_pair_filter(spark):
    from wikitfidf_spark.operators import textstats

    rows = [(1, "target solo alpha"), (2, "target alpha")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    tf = term_frequencies(docs, text="text")
    got = {r["term"] for r in textstats.term_cooccurrence(tf, "target", min_pair_docs=2).collect()}
    assert got == {"alpha"}  # 'solo' co-occurs once, filtered


def test_cosine_zero_norm_vectors_excluded(spark, vectors):
    """Vectors whose elements all quantize to zero (|x| < ~2.24e-5 at
    DOT_QUANT=1e9) carry no cosine signal: both kernels exclude them
    instead of emitting NaN (which Spark's desc sort ranks above every
    real match) — and they stay rank-identical to each other."""
    import pandas as pd

    zeros = spark.createDataFrame(
        [(98, [0.0] * 16), (99, [1e-6] * 16)],
        "vec_id long, embedding array<double>",
    )
    withz = vectors.unionByName(zeros)
    brute = [(r["vec_id"], r["cos"]) for r in similarity.cosine_topk_bruteforce(withz, 0, 50).collect()]
    ids = {i for i, _ in brute}
    assert 98 not in ids and 99 not in ids and len(brute) == 39

    q = np.array(vectors.filter(F.col("vec_id") == 0).collect()[0]["embedding"])
    arrow = [(r["vec_id"], r["cos"]) for r in similarity.cosine_topk_arrow(withz.filter("vec_id != 0"), q, 50).collect()]
    assert arrow == brute

    # a zero-norm QUERY yields an empty exact result / raises in arrow
    assert similarity.cosine_topk_bruteforce(withz, 99, 5).count() == 0
    with pytest.raises(ValueError, match="zero norm"):
        similarity.cosine_topk_arrow(withz, np.zeros(16), 5)


def test_token_counts_empty_docs_report_zero_ws_tokens(spark):
    """split('') returns [''] — empty/whitespace-only/NULL docs must
    report 0 whitespace tokens, not a phantom 1."""
    from wikitfidf_spark.operators import textstats

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "a b")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_ws_tokens"] for r in textstats.token_counts(docs).collect()}
    assert got == {1: 0, 2: 0, 3: 0, 4: 2}
