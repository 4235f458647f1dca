"""The driver-window rotation policy (registry.py docstring), machine-checked.

The correctness driver only ever sees the first DRIVER_WINDOW registry
entries, so a rotation mistake (a changed query left in the tail, or a
tail entry whose last driver row has aged out) would silently weaken the
evidence chain. These tests make that a suite failure instead.
"""

from __future__ import annotations

import json
import os
import re

from mapreduce_hadoop_spark import registry

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _names() -> list[str]:
    return list(registry.queries())


def _latest_correctness() -> "tuple[str, set[str]]":
    """(filename, query names) of the newest committed CORRECTNESS_r*.json."""
    rounds = {}
    for fn in os.listdir(REPO_ROOT):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fn)
        if m:
            rounds[int(m.group(1))] = fn
    assert rounds, "no CORRECTNESS_r*.json committed"
    fn = rounds[max(rounds)]
    with open(os.path.join(REPO_ROOT, fn)) as f:
        return fn, set(json.load(f))


def test_head_window_size_and_total():
    names = _names()
    assert len(names) >= registry.DRIVER_WINDOW, len(names)
    # The registered surface only grows; update alongside new queries.
    assert len(names) == 83, len(names)


def test_changed_queries_are_in_driver_window():
    head = set(_names()[: registry.DRIVER_WINDOW])
    missing = [q for q in registry.CHANGED_THIS_ROUND if q not in head]
    assert not missing, f"changed queries outside the driver window: {missing}"
    unknown = [q for q in registry.CHANGED_THIS_ROUND if q not in set(_names())]
    assert not unknown, f"CHANGED_THIS_ROUND names not in registry: {unknown}"


def test_tail_entries_have_preceding_round_rows():
    """Rotation rule 3: every entry past the driver window must carry a
    driver row from the immediately preceding round (the newest committed
    CORRECTNESS file). When a new round's CORRECTNESS lands, this fails
    until the registry rotates — by design: that IS the reminder.
    """
    fn, covered = _latest_correctness()
    tail = _names()[registry.DRIVER_WINDOW :]
    stale = [q for q in tail if q not in covered]
    assert not stale, f"tail entries with no row in {fn}: {stale}"
