"""Gate-rotation policy invariants. The external correctness gate checks
only queries()[0:50], so the ordering in __spark_entry__.queries() IS the
rotation policy. Round 7 policy (round-6 verdict #1): a staleness cursor
derived from the CORRECTNESS_r*.json files on disk, with a reserved
churn quota at the front of the window. These tests prove the documented
staleness bound by SIMULATION for registries well past the old 100-entry
ceiling, and pin the invariants the old scheme got wrong twice
(hand-kept arithmetic, churn starvation, red rows rotating out)."""

import glob
import json
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

REPO = os.path.dirname(os.path.abspath(entry_mod.__file__))
WINDOW = entry_mod._GATE_WINDOW
QUOTA = entry_mod._CHURN_QUOTA


def _simulate(n_entries, rounds, churn_fn):
    """Run the real ordering rule over synthetic rounds; every round the
    first WINDOW entries of the ordering get a green check. Returns the
    max observed gap (in rounds) between green checks of any entry,
    counting the initial never-checked wait."""
    names = [f"q{i:03d}" for i in range(n_entries)]
    last = {}
    max_gap = 0
    for rnd in range(1, rounds + 1):
        order = entry_mod._rotation_order(names, last, churn_fn(rnd, last))
        for k in order[:WINDOW]:
            last[k] = rnd
        for k in names:
            max_gap = max(max_gap, rnd - last.get(k, 0))
    return max_gap


def test_staleness_bound_holds_for_large_registries():
    """Every entry is green-checked at least every ceil(N/(W-Q)) rounds,
    for any adversarial churn sequence — demonstrated with the worst
    adversary we know: churning the MOST-recently-checked entries every
    round (wasting the full quota on fresh entries)."""
    for n in (84, 96, 100, 126, 150, 200):
        bound = math.ceil(n / (WINDOW - QUOTA))

        def adversary(rnd, last):
            fresh_first = sorted(last, key=lambda k: -last[k])
            return fresh_first[:QUOTA]

        got = _simulate(n, rounds=4 * bound + 8, churn_fn=adversary)
        assert got <= bound, (n, got, bound)


def test_live_registry_staleness_bound():
    """Round-7 verdict 'What's wrong #3': the quota/registry arithmetic
    was hand-derived in a comment twice; make it CI-checked instead.
    With the LIVE registry size and LIVE churn quota, every entry must
    be green-checked at least every 3 rounds — any future quota bump or
    registry growth that silently breaks the re-verification guarantee
    fails here, not in prose. (The comment above _CHURN_QUOTA in
    __spark_entry__.py cites this test.)"""
    n = len(entry_mod._query_registry())
    bound = math.ceil(n / (WINDOW - QUOTA))
    assert bound <= 3, (
        f"live staleness bound ceil({n}/({WINDOW}-{QUOTA})) = {bound} "
        "exceeds the documented 3-round guarantee; shrink _CHURN_QUOTA "
        "or grow the window before registering more queries"
    )

    def adversary(rnd, last):
        fresh_first = sorted(last, key=lambda k: -last[k])
        return fresh_first[:QUOTA]

    got = _simulate(n, rounds=4 * bound + 8, churn_fn=adversary)
    assert got <= bound, (n, got, bound)


def test_no_churn_bound_at_current_size():
    """With an empty churn list the gap is exactly ceil(N/W) — 2 rounds
    up to N=100, 3 above that. Asserted on the live registry size so
    the guarantee in force tracks every registration automatically."""
    n = len(entry_mod._query_registry())
    bound = math.ceil(n / WINDOW)
    got = _simulate(n, rounds=12, churn_fn=lambda rnd, last: [])
    assert got <= bound, (n, got, bound)


def test_churned_entries_always_inside_window():
    """ADVICE r6: the round-5/6 scheme silently dropped churned entries
    off the window's end. Now they lead it by construction — assert on
    the real registry state."""
    assert len(entry_mod._CHURNED_THIS_ROUND) <= QUOTA, (
        "churn list exceeds the reserved quota; trim it or raise "
        "_CHURN_QUOTA (raising loosens the staleness bound)"
    )
    window = list(entry_mod.queries())[:WINDOW]
    base = set(entry_mod._query_registry())
    for k in entry_mod._CHURNED_THIS_ROUND:
        assert k in base, f"churn list names unknown query {k!r}"
        assert k in window, f"churned entry {k!r} fell out of the window"


def test_never_green_entries_lead():
    """New queries and red rows have no green round: they must occupy
    the front of the window (after the churn head)."""
    base = entry_mod._query_registry()
    last = entry_mod._last_green_round()
    window = set(list(entry_mod.queries())[:WINDOW])
    never = [k for k in base if k not in last]
    assert len(never) <= WINDOW - len(entry_mod._CHURNED_THIS_ROUND), (
        f"{len(never)} never-checked entries cannot all fit the window"
    )
    missing = [k for k in never if k not in window]
    assert missing == [], f"never-green entries outside the window: {missing}"


def test_red_rows_do_not_count_as_checked():
    """A red row must keep its pre-red staleness so it re-enters the
    window next round — _is_green is the only place that decides."""
    assert entry_mod._is_green(
        {"rows_match": True, "schema_match": True, "hash_match": True,
         "err": None}
    )
    for bad in (
        {"rows_match": False, "schema_match": True, "hash_match": True},
        {"rows_match": True, "schema_match": False, "hash_match": True},
        {"rows_match": True, "schema_match": True, "hash_match": False},
        {"rows_match": True, "schema_match": True, "hash_match": True,
         "err": "boom"},
        "not-a-dict",
    ):
        assert not entry_mod._is_green(bad), bad
    # hash_match=None is the driver's weaker rows-only check for
    # non-SQL-expressible queries — green by design.
    assert entry_mod._is_green(
        {"rows_match": True, "schema_match": True, "hash_match": None,
         "err": None}
    )


def test_stalest_fill_the_window():
    """The non-churned window slots must hold exactly the stalest
    entries — no hand-picked filler can displace an older one."""
    base = entry_mod._query_registry()
    last = entry_mod._last_green_round()
    order = list(entry_mod.queries())
    churn = [k for k in entry_mod._CHURNED_THIS_ROUND if k in base]
    in_win = order[len(churn):WINDOW]
    out_win = [k for k in order[WINDOW:]]
    if in_win and out_win:
        newest_in = max(last.get(k, -1) for k in in_win)
        oldest_out = min(last.get(k, -1) for k in out_win)
        assert newest_in <= oldest_out


def test_latest_correctness_keys_are_known():
    """Renaming a registered query silently drops its check history —
    surface it loudly for the newest round at least."""
    files = sorted(
        (p for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
         if re.fullmatch(r"CORRECTNESS_r\d+\.json", os.path.basename(p))),
    )
    assert files, "no CORRECTNESS files yet — pre-round-2 repo?"
    with open(files[-1]) as f:
        rows = json.load(f)
    base = set(entry_mod._query_registry())
    # Deliberately retired entries (documented at _RETIRED with their
    # replacement coverage) are the ONE legitimate way a checked name
    # leaves the registry; anything else is a silent rename.
    unknown = set(rows) - base - entry_mod._RETIRED
    assert unknown == set(), (
        f"newest CORRECTNESS file names unknown queries: {unknown}"
    )


def test_last_green_round_reads_real_history():
    """Pin the file parsing against the actual driver artifacts: a
    query green in the newest round maps to that round; one absent
    there but green earlier maps to the earlier round."""
    last = entry_mod._last_green_round()
    files = sorted(
        int(re.fullmatch(r"CORRECTNESS_r(\d+)\.json",
                         os.path.basename(p)).group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if re.fullmatch(r"CORRECTNESS_r\d+\.json", os.path.basename(p))
    )
    newest = files[-1]
    with open(os.path.join(REPO, f"CORRECTNESS_r{newest:02d}.json")) as f:
        rows = json.load(f)
    greens = [k for k, v in rows.items() if entry_mod._is_green(v)]
    assert greens, "newest round has no green rows?"
    for k in greens:
        assert last.get(k) == newest, (k, last.get(k), newest)
    older = [k for k in entry_mod._query_registry()
             if k in last and k not in rows]
    assert all(last[k] < newest for k in older)


def test_queries_is_permutation_of_registry():
    assert sorted(entry_mod.queries()) == sorted(entry_mod._query_registry())
    assert set(entry_mod.oracle_sql()) <= set(entry_mod._query_registry())
