"""Generate golden-output parquets for the driver queries whose
semantics are per-row Python pipelines (not SQL-expressible): the
DuckDB oracle for these becomes ``SELECT * FROM read_parquet(golden)``,
turning the driver's rows-only check into a full rows+schema+hash gate.

The goldens are computed here OUTSIDE Spark — a sequential pure-Python
pass over the pinned sf0.01 tables (TESTDATA.md: seed=42, read-only,
never regenerated) using the same kernels the Spark queries wrap. That
makes the oracle an independent *execution* path: it verifies that the
distributed mapInPandas run (partitioning, Arrow batching, ordering)
reproduces the sequential reference exactly. It does NOT re-derive the
kernel semantics — those are frozen against the reference by the unit
suites (tests/test_html_segments_queries.py,
tests/test_evidence_and_summary.py).

Regenerate (only after an INTENDED kernel change):

    python scripts/gen_golden.py
"""

from __future__ import annotations

import json
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden")

TRANSCRIPT_SUFFIX = (
    ". The host says that creatine improves memory. "
    "I remember a story about it. Magnesium supports deep sleep."
)


def _docs() -> list[tuple[int, str]]:
    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet') ORDER BY doc_id"
    ).fetchall()


def golden_segment_transcripts() -> pa.Table:
    from podcast_plow_spark.functions.summarize import iter_sentences
    from podcast_plow_spark.operators.segments import build_segments

    rows = []
    for did, text in _docs():
        synthetic = (text or "")[:120] + TRANSCRIPT_SUFFIX
        for i, seg in enumerate(build_segments(iter_sentences(synthetic))):
            rows.append((did, i, seg.start_ms, seg.end_ms, len(seg.text.split())))
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "segment_idx": pa.array([r[1] for r in rows], pa.int32()),
            "start_ms": pa.array([r[2] for r in rows], pa.int64()),
            "end_ms": pa.array([r[3] for r in rows], pa.int64()),
            "n_words": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


def golden_extract_claims() -> pa.Table:
    from podcast_plow_spark.operators.segments import extract_claims

    rows = []
    for did, text in _docs():
        synthetic = (text or "")[:120] + TRANSCRIPT_SUFFIX
        for c in extract_claims(synthetic):
            rows.append({"doc_id": did, **c})
    cols = [
        ("doc_id", pa.int64()),
        ("raw_text", pa.string()),
        ("normalized_text", pa.string()),
        ("norm_key", pa.string()),
        ("topic", pa.string()),
        ("domain", pa.string()),
        ("risk_level", pa.string()),
        ("start_ms", pa.int64()),
        ("end_ms", pa.int64()),
    ]
    return pa.table({name: pa.array([r[name] for r in rows], t) for name, t in cols})


def golden_summarize_docs() -> pa.Table:
    from podcast_plow_spark.functions.summarize import (
        format_tldr,
        iter_sentences,
        select_sentences,
    )

    rows = []
    for did, text in _docs():
        sents = [s.text for s in iter_sentences(text or "")] or [(text or "").strip()]
        chosen = select_sentences(sents, max_words=40, max_sentences=3)
        rows.append((did, format_tldr(chosen), len(chosen)))
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "summary": pa.array([r[1] for r in rows], pa.string()),
            "n_points": pa.array([r[2] for r in rows], pa.int32()),
        }
    )


def golden_stance_classify() -> pa.Table:
    from podcast_plow_spark.functions.evidence import classify_stance

    con = duckdb.connect()
    events = con.execute(
        f"SELECT event_type, value, props FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()
    counts: dict[str, int] = {}
    for event_type, value, props in events:
        claim = f"{event_type} increases value"
        if value > 300:
            title = "significant improvement in outcomes"
        elif value > 150:
            title = "no effect was observed"
        else:
            title = "results were inconclusive"
        k = json.loads(props).get("k") if props else None
        abstract = str(k) if k is not None else None
        stance = classify_stance(claim, title, abstract)
        counts[stance] = counts.get(stance, 0) + 1
    stances = sorted(counts)
    return pa.table(
        {
            "stance": pa.array(stances, pa.string()),
            "n": pa.array([counts[s] for s in stances], pa.int64()),
        }
    )


def golden_pipeline_e2e() -> pa.Table:
    """Sequential twin of ``__spark_entry__.q_pipeline_e2e`` — the
    composed nightly chain (discover → top-2-per-show → transcript →
    summarize → extract claims → deterministic evidence → grade), run
    as a plain python loop so the distributed composition is checked
    end-to-end against an independent execution path."""
    import hashlib

    from podcast_plow_spark.functions.summarize import iter_sentences, select_sentences
    from podcast_plow_spark.operators.grade import (
        META_KEYWORDS,
        OBSERVATIONAL_KEYWORDS,
        RCT_KEYWORDS,
        WEAK_KEYWORDS,
    )
    from podcast_plow_spark.operators.segments import extract_claims

    from __spark_entry__ import _PIPE_EV_TYPES

    def bucket_of(ev_type: str) -> str:
        t = (ev_type or "").strip().lower()
        if not t:
            return "weak"
        for kws, b in (
            (META_KEYWORDS, "meta"),
            (RCT_KEYWORDS, "rct"),
            (WEAK_KEYWORDS, "weak"),
            (OBSERVATIONAL_KEYWORDS, "observational"),
        ):
            if any(kw in t for kw in kws):
                return b
        return "observational"

    def grade_of(s: dict, r: dict) -> str:
        total_s, total_r = sum(s.values()), sum(r.values())
        if total_s == 0 or total_r > total_s:
            return "unsupported"
        if s["meta"] >= 1 or s["rct"] >= 2:
            return "strong"
        if s["rct"] >= 1 or s["observational"] >= 2:
            return "moderate"
        if s["observational"] >= 1 or s["weak"] >= 1:
            return "weak"
        return "unsupported"

    by_show: dict[int, list[tuple[int, str]]] = {}
    for did, text in _docs():
        by_show.setdefault(did % 40, []).append((did, text))
    picked: list[tuple[int, str]] = []
    for lst in by_show.values():
        lst.sort(key=lambda x: -x[0])
        picked += lst[:2]
    picked.sort()

    rows = []
    for did, text in picked:
        synthetic = (text or "")[:120] + TRANSCRIPT_SUFFIX
        sents = [s.text for s in iter_sentences(synthetic)] or [synthetic.strip()]
        n_points = len(select_sentences(sents, max_words=40, max_sentences=3))
        for c in extract_claims(synthetic):
            cid = f"{did}|{c['norm_key']}"
            sup = {"meta": 0, "rct": 0, "observational": 0, "weak": 0}
            ref = {"meta": 0, "rct": 0, "observational": 0, "weak": 0}
            for e in range(3):
                h = int(hashlib.sha256(f"{cid}#{e}".encode()).hexdigest()[:15], 16)
                b = bucket_of(_PIPE_EV_TYPES[h % 6])
                (ref if h % 4 == 0 else sup)[b] += 1
            rows.append(
                (did, c["norm_key"], c["topic"], c["domain"], c["risk_level"],
                 n_points, sum(sup.values()), sum(ref.values()), grade_of(sup, ref))
            )
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "norm_key": pa.array([r[1] for r in rows], pa.string()),
            "topic": pa.array([r[2] for r in rows], pa.string()),
            "domain": pa.array([r[3] for r in rows], pa.string()),
            "risk_level": pa.array([r[4] for r in rows], pa.string()),
            "n_points": pa.array([r[5] for r in rows], pa.int32()),
            "total_support": pa.array([r[6] for r in rows], pa.int64()),
            "total_refute": pa.array([r[7] for r in rows], pa.int64()),
            "grade": pa.array([r[8] for r in rows], pa.string()),
        }
    )


GOLDENS = {
    "segment_transcripts": golden_segment_transcripts,
    "extract_claims": golden_extract_claims,
    "summarize_docs": golden_summarize_docs,
    "stance_classify": golden_stance_classify,
    "pipeline_e2e": golden_pipeline_e2e,
}


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    for name, fn in GOLDENS.items():
        table = fn()
        path = os.path.join(OUT_DIR, f"{name}_sf001.parquet")
        pq.write_table(table, path)
        print(f"{name}: {table.num_rows} rows -> {path}")


if __name__ == "__main__":
    main()
