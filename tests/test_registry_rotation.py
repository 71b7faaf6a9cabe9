"""Gate-rotation policy invariants (round-5 verdict #1/#3): the external
correctness gate checks only queries()[0:50], so the mechanical ordering
in __spark_entry__.queries() must provably guarantee that no entry is
ever unchecked two consecutive rounds. These tests fail the build — not
the judge — if a round's additions or a wrong _GATE_BASIS break the
rotation capacity."""

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

REPO = os.path.dirname(os.path.abspath(entry_mod.__file__))
WINDOW = 50


def test_registry_capacity():
    """A 50-slot window with an every-other-round guarantee sustains at
    most 100 entries: the lead set (everything unchecked last round +
    new entries) must always fit the window."""
    base = entry_mod._query_registry()
    assert len(base) <= 2 * WINDOW
    checked = entry_mod._gate_checked_keys()
    lead = [k for k in base if k not in checked]
    assert len(lead) <= WINDOW, (
        f"{len(lead)} entries need checking this round but the window "
        f"holds {WINDOW}; too many additions since {entry_mod._GATE_BASIS}"
    )


def test_everything_unchecked_last_round_leads():
    base = entry_mod._query_registry()
    checked = entry_mod._gate_checked_keys()
    window = list(entry_mod.queries())[:WINDOW]
    missing = [k for k in base if k not in checked and k not in window]
    assert missing == [], (
        f"unchecked-last-round entries outside the gate window: {missing}"
    )


def test_gate_basis_is_current():
    """_GATE_BASIS must be the newest CORRECTNESS file, or the
    second-newest (the driver writes this round's file after the code is
    frozen, so during judging the basis is one behind)."""
    files = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if re.fullmatch(r"CORRECTNESS_r\d+\.json", os.path.basename(p))
    )
    assert files, "no CORRECTNESS files yet — pre-round-2 repo?"
    assert entry_mod._GATE_BASIS in files[-2:], (
        f"_GATE_BASIS={entry_mod._GATE_BASIS} is stale; newest: {files[-1]}"
    )


def test_gate_basis_parses_to_known_queries():
    checked = entry_mod._gate_checked_keys()
    assert checked, f"{entry_mod._GATE_BASIS} unreadable or empty"
    base = set(entry_mod._query_registry())
    unknown = checked - base
    assert unknown == set(), (
        f"basis names queries the registry no longer has: {unknown} "
        "(renaming a registered query silently drops its check history)"
    )


def test_churned_list_entries_exist():
    base = set(entry_mod._query_registry())
    unknown = [k for k in entry_mod._CHURNED_THIS_ROUND if k not in base]
    assert unknown == []


def test_queries_is_permutation_of_registry():
    assert sorted(entry_mod.queries()) == sorted(entry_mod._query_registry())
    assert set(entry_mod.oracle_sql()) <= set(entry_mod._query_registry())


def test_gate_basis_rows_were_green():
    """The rotation argument assumes last round's window was GREEN —
    a red row must stay in-window, which the mechanical ordering only
    does for unchecked entries. Surface red basis rows loudly so they
    get hand-pinned into _CHURNED_THIS_ROUND."""
    path = os.path.join(REPO, entry_mod._GATE_BASIS)
    with open(path) as f:
        rows = json.load(f)
    window = set(list(entry_mod.queries())[:WINDOW])
    red = [
        k for k, v in rows.items()
        if isinstance(v, dict)
        and not (v.get("rows_match") and v.get("schema_match")
                 and v.get("hash_match") is not False)
        and k not in window
    ]
    assert red == [], f"red basis rows rotated out of the window: {red}"
