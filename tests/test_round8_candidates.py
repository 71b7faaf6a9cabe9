"""Oracle parity for the implemented-but-unregistered round-8 candidate
queries (see the 'round-8 candidates' section of __spark_entry__.py):
the exact comparison the driver gate will run once they are registered,
so registration next round is a two-line change with zero new risk."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from tests.test_oracle import SF_DIR, dtype_kinds, normalize, run_duck

CANDIDATES = {
    "space_vacuum_read": (
        entry_mod.space_vacuum_read, entry_mod.SPACE_VACUUM_SQL),
    "space_branch_write": (
        entry_mod.space_branch_write, entry_mod.SPACE_BRANCH_SQL),
    "space_schema_evolution": (
        entry_mod.space_schema_evolution, entry_mod.SPACE_EVOLUTION_SQL),
    "multimodal_video_metadata": (
        entry_mod.multimodal_video_metadata, entry_mod.VIDEO_METADATA_SQL),
    "ann_hard_negatives": (
        entry_mod.ann_hard_negatives, entry_mod.ANN_HARDNEG_SQL),
    "sample_quality_mix": (
        entry_mod.sample_quality_mix, entry_mod.SAMPLE_QUALITY_SQL),
    "stream_session_agg": (
        entry_mod.stream_session_agg, entry_mod.STREAM_SESSION_SQL),
    "space_bucketed_join": (
        entry_mod.space_bucketed_join, entry_mod.SPACE_BUCKETED_JOIN_SQL),
    "space_incremental_dedup": (
        entry_mod.space_incremental_dedup, entry_mod.SPACE_INCR_DEDUP_SQL),
}


def test_candidates_are_not_registered_yet():
    """Ordering invariant: registering one of these must be a deliberate
    round decision (new entries lead the gate window) — this test exists
    to be DELETED in the round that registers them."""
    overlap = set(CANDIDATES) & set(entry_mod._query_registry())
    assert overlap == set(), (
        f"{overlap} got registered; delete its CANDIDATES entry and this "
        "guard as part of the registration commit"
    )


@pytest.mark.parametrize("name", sorted(CANDIDATES))
def test_candidate_matches_oracle(spark, name):
    import pandas as pd

    fn, sql = CANDIDATES[name]
    spark_raw = fn(spark, SF_DIR).toPandas()
    duck_raw = run_duck(sql)
    sk, dk = dtype_kinds(spark_raw), dtype_kinds(duck_raw)
    mismatched = {
        c: (sk.get(c), dk.get(c))
        for c in set(sk) | set(dk)
        if sk.get(c) != dk.get(c)
    }
    assert not mismatched, f"{name}: dtype-kind mismatch {mismatched}"
    spark_pdf, duck_pdf = normalize(spark_raw), normalize(duck_raw)
    assert list(spark_pdf.columns) == list(duck_pdf.columns)
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: rows {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf, check_dtype=False, check_exact=True, obj=name
    )
