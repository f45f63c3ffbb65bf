"""Mechanical enforcement of the verification-window rotation policy
(VERDICT r06 next-round #3). The driver hashes the FIRST 50 registry
entries each round; rounds 5 and 6 let new-operator volume displace the
stale r01/r02 re-confirmation cohort twice in a row. These tests parse
the SHIPPED CORRECTNESS_r*.json history, compute per-entry evidence
age, and fail the suite if the upcoming window repeats that mistake:

RULE A (first evidence): every registered entry with no driver row in
    any shipped CORRECTNESS file must hold a slot in the upcoming
    window — an operator may not be registered and left unevidenced.

RULE B (oldest-first precedence): if evidenced entries are left out of
    the window, no window slot may hold a RE-confirmation of an entry
    with strictly younger evidence than the oldest one left out.
    Entries whose code changed since their last evidence are exempt
    (fresh evidence for changed code is first evidence in spirit); the
    exemption list is ``CHANGED_ROWS`` in operators/__init__ and must
    be re-justified in the ledger every round.

    SPENT-WINDOW EXEMPTION (VERDICT r07 what's-wrong #1): when the
    newest shipped CORRECTNESS window is exactly PRIORITY_ENTRIES, the
    window is *spent*, not *planned* — the round just ended and its own
    evidence must not be read as "younger re-confirmation". RULE A/B
    are vacuous on a spent window; what matters then is that nobody
    starts building the next round on top of it. So in spent mode the
    check becomes: no commit may touch graphdb_wikidata_spark/ after
    the commit that landed the newest CORRECTNESS artifact, and the
    package working tree must be clean — i.e. fire on "started round
    N+1 without rotating", not on "round N finished".

RULE C (derived age bound): with oldest-first scheduling the worst-case
    evidence age is ceil(registry / 50) + 2 rounds; assert no entry
    exceeds it.

The retro tests prove the checker has teeth: replayed against the
historical r5 and r6 windows (with no exemptions, since those rounds'
changed-row lists are not reconstructible from data), RULE B fires on
both — exactly the two rounds the judge flagged.
"""

from __future__ import annotations

import glob
import json
import math
import os
import re
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW_SLOTS = 50


def _newest_correctness_file() -> str:
    files = sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda f: int(re.search(r"r(\d+)", os.path.basename(f)).group(1)),
    )
    return files[-1]


def _git(*args: str) -> str | None:
    try:
        out = subprocess.run(
            ["git", *args], cwd=REPO, capture_output=True, text=True, timeout=30
        )
    except (OSError, subprocess.TimeoutExpired):
        return None
    return out.stdout if out.returncode == 0 else None


def _package_work_since_artifact(artifact: str) -> list[str] | None:
    """Commits touching the package after the newest CORRECTNESS
    artifact landed, plus any dirty package files — the 'started round
    N+1 without rotating' signal. None when git can't answer (no repo,
    artifact uncommitted): benign, the spent window just passes."""
    rel = os.path.basename(artifact)
    landed = _git("log", "--format=%H", "-1", "--", rel)
    if not landed or not landed.strip():
        return None
    since = _git(
        "log", "--format=%h %s", f"{landed.strip()}..HEAD", "--", "graphdb_wikidata_spark"
    )
    dirty = _git("status", "--porcelain", "--", "graphdb_wikidata_spark")
    work = [ln for ln in (since or "").splitlines() if ln.strip()]
    work += [ln for ln in (dirty or "").splitlines() if ln.strip()]
    return work


def _history() -> dict[str, list[int]]:
    hist: dict[str, list[int]] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for k in json.load(open(f)):
            hist.setdefault(k, []).append(rnd)
    return hist


def _violations(
    registry: set[str],
    window: set[str],
    prior: dict[str, int],
    changed_rows: set[str],
) -> tuple[list[str], list[tuple[str, int]]]:
    """(rule A violations, rule B violations) for one window proposal.

    ``prior`` maps each evidenced entry to its latest evidence round
    BEFORE the window under test runs."""
    never = [k for k in sorted(registry - set(prior)) if k not in window]
    out = [k for k in registry - window if k in prior]
    if not out:
        return never, []
    oldest_out = min(prior[k] for k in out)
    reconf = [
        (k, prior[k])
        for k in sorted(window)
        if k in prior and k not in changed_rows and prior[k] > oldest_out
    ]
    return never, reconf


@pytest.fixture(scope="module")
def hist():
    h = _history()
    assert h, "no CORRECTNESS_r*.json shipped — cannot audit rotation"
    return h


def test_upcoming_window_pays_evidence_debt(hist):
    from graphdb_wikidata_spark.operators import (
        CHANGED_ROWS,
        PRIORITY_ENTRIES,
        all_queries,
    )

    registry = set(all_queries())
    assert len(PRIORITY_ENTRIES) == WINDOW_SLOTS
    assert len(set(PRIORITY_ENTRIES)) == WINDOW_SLOTS, "duplicate window slots"
    window = set(PRIORITY_ENTRIES)

    newest = _newest_correctness_file()
    if set(json.load(open(newest))) == window:
        # SPENT window: the round just ended and the driver landed this
        # exact window's evidence. RULE A/B are vacuous here; instead
        # fire if someone started building the next round without
        # rotating first.
        work = _package_work_since_artifact(newest)
        assert not work, (
            f"package source changed after {os.path.basename(newest)} "
            f"landed while PRIORITY_ENTRIES is still the SPENT window — "
            f"rotate PRIORITY_ENTRIES per the ledger in "
            f"operators/__init__.py (and update CHANGED_ROWS) as the "
            f"round's first action. Offending work: {work}"
        )
        return

    prior = {k: max(v) for k, v in hist.items() if k in registry}
    never, reconf = _violations(registry, window, prior, set(CHANGED_ROWS))
    assert not never, (
        f"registered entries with NO driver evidence left out of the "
        f"window: {never}"
    )
    assert not reconf, (
        f"window re-confirms younger entries while older evidence waits "
        f"outside (entry, its_evidence_round): {reconf} — rotate "
        f"PRIORITY_ENTRIES per the ledger in operators/__init__.py (and "
        f"update CHANGED_ROWS)."
    )
    # every CHANGED_ROWS exemption must actually be in the window —
    # exempting an entry without re-evidencing it would be a loophole
    missing = [k for k in CHANGED_ROWS if k not in window]
    assert not missing, f"CHANGED_ROWS not re-windowed: {missing}"


def test_age_bound_holds(hist):
    from graphdb_wikidata_spark.operators import PRIORITY_ENTRIES, all_queries

    registry = set(all_queries())
    current = max(max(v) for v in hist.values()) + 1
    budget = math.ceil(len(registry) / WINDOW_SLOTS) + 2
    window = set(PRIORITY_ENTRIES)
    over = sorted(
        (k, current - max(v))
        for k, v in hist.items()
        if k in registry and k not in window and current - max(v) > budget
    )
    assert not over, (
        f"entries outside the window exceed the derived age bound "
        f"({budget} rounds): {over}"
    )


def test_spent_checker_sees_package_work_after_artifact():
    """The spent-window branch has teeth: round-8 package commits land
    AFTER the r07 artifact in this repo's history, so had the window
    not been rotated, the spent check would have fired on them."""
    work = _package_work_since_artifact(os.path.join(REPO, "CORRECTNESS_r07.json"))
    if work is None:
        pytest.skip("git history unavailable")
    assert work, (
        "expected the round-8 package commits after CORRECTNESS_r07.json "
        "to be visible to the spent-window checker"
    )


@pytest.mark.parametrize("target", [5, 6])
def test_checker_catches_historical_windows(hist, target):
    """The r5 and r6 windows displaced the stale cohort — the checker
    must flag both (VERDICT r06: 'it would have failed on the r5 and
    r6 windows')."""
    window = set(
        json.load(open(os.path.join(REPO, f"CORRECTNESS_r0{target}.json")))
    )
    prior = {
        k: max(r for r in v if r < target)
        for k, v in hist.items()
        if any(r < target for r in v)
    }
    registry_then = set(prior) | window  # best reconstruction from data
    never, reconf = _violations(registry_then, window, prior, set())
    assert reconf, f"round {target} window should have been flagged"
