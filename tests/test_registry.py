"""Evidence-ledger guard (VERDICT r10 #8): the driver checks only the
first 50 registered queries per round, so breadth of driver-green
evidence depends entirely on the rotation discipline in
``queries/__init__._WINDOW``. These tests make that discipline
mechanical: the window must be exactly the driver's 50 oracled slots,
and every oracled query must either sit in the upcoming window, carry
driver evidence from the last 3 completed rounds, or be a NAMED
deferral (``_DEFERRED``) no more than 4 rounds stale — a row going
stale silently now fails the suite instead of surfacing in a verdict.

Rows-only queries (registered without an oracle) are exempt: they are
permanently out of the window per the VERDICT r3 ruling, and each is
pinned by property tests and (since round 11) an oracled ``agree_*``
gate in queries/agreement.py.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

from vspace_spark import queries as Q
from vspace_spark.queries import ORACLES, QUERIES, load_all

load_all()

REPO = Path(__file__).resolve().parent.parent


def _row_is_green(row: object) -> bool:
    """A driver row counts as evidence only when it PASSED: a red row
    (hash mismatch, schema drift, or an error) refreshing the
    staleness clock would silence exactly the failures this guard
    exists to keep in attention (VERDICT r11 #4 / ADVICE r11)."""
    return (
        isinstance(row, dict)
        and row.get("rows_match") is True
        and row.get("schema_match") is True
        and row.get("hash_match") is True
        and not row.get("err")
    )


def _evidence(
    ledgers: list[Path] | None = None,
) -> tuple[int, dict[str, int]]:
    """(latest completed round, query -> latest round with a GREEN
    driver row) from the CORRECTNESS_r*.json ledger at the repo
    root (or an injected fixture list, for testing the guard)."""
    latest: dict[str, int] = {}
    rounds = []
    if ledgers is None:
        ledgers = sorted(REPO.glob("CORRECTNESS_r*.json"))
    for f in ledgers:
        m = re.search(r"_r(\d+)\.json$", f.name)
        if not m:
            continue
        r = int(m.group(1))
        rounds.append(r)
        for name, row in json.loads(f.read_text()).items():
            if _row_is_green(row):
                latest[name] = max(r, latest.get(name, 0))
    return (max(rounds) if rounds else 0), latest


def test_window_is_the_driver_contract():
    assert len(Q._WINDOW) == 50
    assert len(set(Q._WINDOW)) == 50, "duplicate window entries"
    unknown = [n for n in Q._WINDOW if n not in QUERIES]
    assert not unknown, f"window names not registered: {unknown}"
    rows_only = [n for n in Q._WINDOW if n not in ORACLES]
    assert not rows_only, (
        f"window slots must go to oracled queries only: {rows_only}"
    )
    assert list(QUERIES)[:50] == Q._WINDOW, "load_all reorder drifted"


def test_deferrals_are_registered_oracled_and_not_windowed():
    unknown = [n for n in Q._DEFERRED if n not in ORACLES]
    assert not unknown, f"deferred names not oracled queries: {unknown}"
    both = set(Q._DEFERRED) & set(Q._WINDOW)
    assert not both, f"deferred AND windowed (pick one): {sorted(both)}"


def test_red_driver_rows_are_not_evidence(tmp_path):
    """A failing driver row must NOT refresh the staleness clock: the
    guard synthesizes a ledger where `broken_q` only ever appears red
    (hash mismatch, then an error) and `green_q` passes once, and
    asserts only the green row registers."""
    rows = {
        "r1": {
            "green_q": {
                "rows_match": True, "schema_match": True,
                "hash_match": True, "spark_rows": 3, "oracle_rows": 3,
                "err": None,
            },
            "broken_q": {
                "rows_match": True, "schema_match": True,
                "hash_match": False, "spark_rows": 3, "oracle_rows": 3,
                "err": None,
            },
        },
        "r2": {
            "broken_q": {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": 0, "oracle_rows": 3,
                "err": "AnalysisException: ...",
            },
        },
    }
    ledgers = []
    for tag, content in rows.items():
        p = tmp_path / f"CORRECTNESS_{tag}.json"
        p.write_text(json.dumps(content))
        ledgers.append(p)
    cur, latest = _evidence(ledgers)
    assert cur == 2
    assert latest == {"green_q": 1}, latest


def test_no_oracled_query_goes_stale_unnamed():
    cur, latest = _evidence()
    if cur == 0:
        pytest.skip("no CORRECTNESS ledger in this checkout")
    stale, overdue = [], []
    for name in ORACLES:
        if name in Q._WINDOW:
            continue  # re-proved next driver run
        age_ok = latest.get(name, 0) >= cur - 2
        if age_ok:
            continue
        if name in Q._DEFERRED:
            if latest.get(name, 0) < cur - 3:
                overdue.append((name, latest.get(name)))
            continue
        stale.append((name, latest.get(name)))
    assert not stale, (
        f"oracled queries with evidence older than round {cur - 2}, "
        f"neither windowed nor in _DEFERRED: {stale}"
    )
    assert not overdue, (
        f"_DEFERRED entries past the 4-round bound — they must enter "
        f"the next window, not defer again: {overdue}"
    )
