"""Correctness-window rotation guard (round-4 verdict directive #6).

The driver verifies only the FIRST 50 entries of ``QUERIES`` each round,
so a query outside every round's window would never get driver evidence
(``audio_features`` sat unverified for four rounds this way). The
rotation manifest (``tools/rotation_manifest.json``) records each past
round's actual window (the keys of the committed CORRECTNESS files) plus
the currently-planned window; this test fails the moment a declared
query has no driver row anywhere AND is not scheduled in the upcoming
window — i.e. a query can never again silently sit unverified.
"""

from __future__ import annotations

import glob
import itertools
import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _declared() -> list[str]:
    import sys

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry

    return list(entry.QUERIES.keys())


def test_declared_surface_within_rotation_capacity():
    """The 50-slot window re-greens at most 50 queries/round, and the
    freshness policy tolerates evidence up to 3 rounds old — so the
    sustainable declared surface is hard-capped at 150 queries (every
    round re-greens exactly the 50 oldest). Declaring a 151st query
    would force some query past the 3-round staleness bound with no
    window slot to fix it; new capability beyond the cap must CONSOLIDATE
    into composed queries or replace retired ones."""
    assert len(_declared()) <= 150


def test_every_query_has_driver_evidence():
    declared = _declared()
    covered: set[str] = set()
    for path in glob.glob(str(REPO / "CORRECTNESS_r*.json")):
        covered |= set(json.load(open(path)).keys())
    covered |= set(declared[:50])  # the upcoming round's window
    missing = sorted(set(declared) - covered)
    assert not missing, (
        f"queries with no driver evidence and no window slot: {missing} — "
        "rotate them into the first 50 entries of QUERIES"
    )


def test_rotation_manifest_matches_current_window():
    """The committed manifest's planned window must be the REAL first-50
    of QUERIES, so the documented rotation can't drift from the code."""
    manifest = json.load(open(REPO / "tools" / "rotation_manifest.json"))
    planned_key = max(k for k in manifest if k.endswith("_planned"))
    assert manifest[planned_key] == _declared()[:50]


def test_rotation_manifest_covers_all_declared():
    """Union of all manifest windows (past rounds + planned) covers every
    declared query."""
    manifest = json.load(open(REPO / "tools" / "rotation_manifest.json"))
    union = set(itertools.chain.from_iterable(manifest.values()))
    missing = sorted(set(_declared()) - union)
    assert not missing, f"declared queries absent from rotation manifest: {missing}"


def test_every_query_has_oracle_or_documented_exemption():
    """Every window-eligible query needs an ORACLES entry unless it is a
    deliberate rows-only contract (streaming side effects, approximate
    ops, codec featurization) — keep this list short and intentional."""
    import sys

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry

    ROWS_ONLY = {
        # streaming drained state whose emitted set depends on arrival
        # order (cross-batch straggler folds + final-watermark closure),
        # so no SQL oracle can exist; batch≡stream unit-tested.
        # stream_upsert_replay graduated r15: its drained MERGE target is
        # arrival-order-INdependent (identical doubled rows, pass-through
        # upsert), so it carries a full oracle now.
        "sessionize_stream",
        # approximate ops: ±bound/recall unit-tested, no SQL equivalent
        "approx_percentiles_by_status",
        # WARC ingestion: DuckDB cannot parse WARC (no reader), so no
        # SQL oracle can exist; semantics pinned by hand-built
        # exact-Content-Length archives across all three gzip layouts,
        # chunk-boundary stress, corruption-resync/folding/cap units,
        # the binaryFile≡paths connector identity, and the fixture row
        # arithmetic in tests/test_warc.py (declared r13, §5 swap #9)
        "warc_html_corpus",
        # index-first WARC ingestion (declared r15, §5 swap #15): same
        # no-WARC-reader-in-DuckDB necessity as warc_html_corpus;
        # semantics pinned by tests/test_cdx.py (index-first rows ≡
        # full-scan rows on the digest-unique fixture, deterministic-
        # winner selection on planted duplicate digests) and the
        # ranged-reader bounds/exact-range units in tests/test_warc.py
        "warc_cdx_ranged_corpus",
        # persisted-index day-2 probes: same no-SQL-twin hashes as the
        # one-shot variants; no-corpus-rescan plan + recall unit-tested
        "minhash_near_dup_day2",
        "simhash_near_dup_day2",
        # IVF-pruned decontam: cell assignment is iterative k-means;
        # recall-1.0-at-operating-point + pruning-bound unit-tested
        "semantic_decontam_pruned",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "ann_ivfpq_topk",
        "ann_ivfpq_day2",
        "embedding_near_pairs_lsh",
        "semantic_dedup_embeddings",
        # zlib band filter: DuckDB has no zlib scalar, so no SQL oracle
        # can exist; exact arithmetic + ordering anchors + determinism
        # pinned in tests/test_compress.py (declared r12, §5 swap #5)
        "compression_band_docs",
        # codec featurization: roundtrip/determinism unit-tested
        "media_decode_features",
        "audio_features",
        # greedy iterative merge replay is not SQL-expressible; paper
        # corpus + roundtrip + zero-shuffle plan unit-tested
        "bpe_tokenize_docs",
        # iterative k-means is not SQL-expressible; convergence,
        # determinism, planted-recovery and partials-bound unit-tested
        "kmeans_clusters_embeddings",
        # HLL estimate has no SQL oracle; merge-lossless + error-bound
        # + state-size units in tests/test_incremental_dedup.py
        "incremental_distinct_day2",
    }
    oracles = set(entry.oracle_sql().keys())
    for name in entry.QUERIES:
        if name in ROWS_ONLY:
            assert name not in oracles, f"{name} is listed rows-only but has an oracle"
        else:
            assert name in oracles, f"{name} has no oracle and no documented exemption"


def test_bench_history_archived_for_every_completed_round():
    """The r9 postmortem (VERDICT r10 item 4): per-query bench detail was
    lost because the session never snapshotted BENCH_DETAIL.json before
    bench.py overwrote it. Mechanize the discipline: every driver round
    older than the newest committed BENCH_r*.json must have a snapshot in
    tools/bench_history/ (rounds 1-3 predate the convention and r02/r03
    were never captured — grandfathered). The newest round's snapshot is
    exempt because its detail only becomes available when the driver runs
    bench AFTER the session; the NEXT session archives it (from
    BENCH_DETAIL.json at session start) and this test goes red if it
    forgets."""
    import re

    # filter, don't .group() blind (same rule as bench.py's archive
    # hook): the r15 driver added BENCH_r15_c8.json — a low-core-count
    # companion run, not a round — which matches the glob but not the
    # round regex
    matches = [
        re.search(r"BENCH_r(\d+)\.json$", p)
        for p in glob.glob(str(REPO / "BENCH_r*.json"))
    ]
    rounds = sorted(int(m.group(1)) for m in matches if m)
    grandfathered = {2, 3}
    missing = [
        n
        for n in rounds[:-1]
        if n not in grandfathered
        and not (REPO / "tools" / "bench_history" / f"r{n:02d}.json").exists()
    ]
    assert not missing, (
        f"rounds without a bench_history snapshot: {missing} — archive "
        "BENCH_DETAIL.json (or reconstruct from the BENCH_rNN tail) before "
        "running bench.py this session"
    )
