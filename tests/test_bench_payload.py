"""Bench stdout-payload encoding (driver contract, VERDICT r14 item 1).

The driver stores only the LAST 2000 chars of bench stdout and its
comparator consumes the per-query map from that line.  r14's nd=0
fallback rounded 13 ran sub-0.5 s queries to 0 — read as DROPPED —
so the encoding now guarantees: a ran query never serializes as 0, and
per-query resolution stays >= 0.1 s at the current headline count (the
decisecond tier fires before the integer-second fallback).
"""

from __future__ import annotations

import json

from bench import HEADLINE, _stdout_payload


def _parse(payload: str) -> dict:
    assert payload is not None
    assert len(payload) < 1990
    return json.loads(payload)


def test_payload_fits_at_current_headline_count_with_realistic_timings():
    # realistic r14-shaped timings: mostly sub-second, a few 4-10 s
    timings = {n: 0.25 + (i % 7) * 1.37 for i, n in enumerate(HEADLINE)}
    body = _parse(_stdout_payload(round(sum(timings.values()), 3),
                                  0.1, True, timings))
    assert set(body["queries"]) == set(HEADLINE)
    assert body["unit"] == "sec"


def test_no_ran_query_ever_serializes_as_zero():
    # worst case for the old encoding: every query tiny -> nd escalates,
    # but nonzero timings must stay nonzero at EVERY tier
    for base in (0.049, 0.4, 0.94):
        timings = {n: base for n in HEADLINE}
        body = _parse(_stdout_payload(round(sum(timings.values()), 3),
                                      0.1, True, timings))
        assert all(v > 0 for v in body["queries"].values()), body["nd"]
    # a genuinely-zero timing (query skipped) still encodes as 0
    timings = dict.fromkeys(HEADLINE, 0.3)
    timings[HEADLINE[0]] = 0.0
    body = _parse(_stdout_payload(1.0, 0.1, True, timings))
    assert body["queries"][HEADLINE[0]] == 0


def test_r14_timings_keep_tenth_second_resolution():
    # The regression this guards: the driver's REAL r14 timings
    # overflowed nd=1 (2047 chars measured) and fell to nd=0, rounding
    # 13 ran queries to 0.  With the ds tier they must encode at 0.1 s
    # resolution with zero zeros.
    import os
    detail = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_DETAIL_r14.json")
    with open(detail) as fh:
        d = json.load(fh)
    timings = d["queries"]
    body = _parse(_stdout_payload(d["value"], d["sf"], True, timings))
    assert body["nd"] == -1 and body["qunit"] == "ds"
    assert all(v > 0 for n, v in body["queries"].items() if timings[n] > 0)
    # deciseconds are the exact rounded tenths of the detail numbers
    for n, t in timings.items():
        assert body["queries"][n] == max(1, int(round(t * 10))), n
