"""Sessionization vs a sequential python brute force.

Edge cases pinned: gap exactly equal to the threshold stays in the
SAME session (strict >); equal timestamps are ordered by event_id;
negative values floor toward -inf; single-event sessions have
dur_us = 0.
"""

import datetime as dt
import math

from spatialjoincountovershells_spark.operators.events import (
    funnel,
    retention,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(eid, user, off_us, etype, value):
    return (eid, T0 + dt.timedelta(microseconds=off_us), user, etype, value)


def _brute(rows, gap_s):
    gap_us = gap_s * 1_000_000
    base = int(T0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    by_user = {}
    for eid, ts, user, etype, value in rows:
        us = base + int((ts - T0).total_seconds() * 0 +
                        (ts - T0) / dt.timedelta(microseconds=1))
        by_user.setdefault(user, []).append((us, eid, etype, value))
    want = {}
    for user, evs in by_user.items():
        evs.sort()
        ord_ = 0
        prev = None
        cur = None
        for us, eid, etype, value in evs:
            if prev is None or us - prev > gap_us:
                ord_ += 1
                cur = {"n": 0, "types": set(), "start": us, "end": us,
                       "vq": 0}
                want[(user, ord_)] = cur
            cur["n"] += 1
            cur["types"].add(etype)
            cur["end"] = us
            cur["vq"] += math.floor(value * 1024.0)
            prev = us
    return {
        k: (v["n"], len(v["types"]), v["start"], v["end"] - v["start"],
            v["vq"])
        for k, v in want.items()
    }


def test_sessionize_vs_bruteforce(spark):
    gap = 60  # seconds
    rows = [
        # user 1: three events in one session, then a gap, then two more
        _ev(1, 1, 0, "a", 1.5),
        _ev(2, 1, 30_000_000, "b", -0.25),
        _ev(3, 1, 90_000_000, "a", 2.0),  # 60s gap exactly: SAME session
        _ev(4, 1, 151_000_000, "c", 0.0),  # 61s: NEW session
        _ev(5, 1, 200_000_000, "c", 10.125),
        # user 2: equal timestamps, order by event_id; big id first to
        # prove the tiebreak is the id not arrival order
        _ev(20, 2, 0, "a", 1.0),
        _ev(10, 2, 0, "b", 1.0),
        _ev(30, 2, 500_000_000, "a", 3.75),  # own session
        # user 3: single event
        _ev(40, 3, 7, "z", -1.001),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double",
    )
    got = {
        (r.user_id, r.session_ord):
            (r.n_events, r.n_types, r.start_us, r.dur_us, r.value_q10)
        for r in sessionize(df, gap_s=gap).collect()
    }
    want = _brute(rows, gap)
    # timezone normalization: compare (start mod day) too fragile;
    # instead compare relative starts per user
    assert set(got) == set(want)
    for k in want:
        gn, gt, gs, gd, gv = got[k]
        wn, wt, ws, wd, wv = want[k]
        assert (gn, gt, gd, gv) == (wn, wt, wd, wv), k
    # relative session starts within each user match the brute force
    for user in (1, 2, 3):
        g = sorted(v[2] for k, v in got.items() if k[0] == user)
        w = sorted(v[2] for k, v in want.items() if k[0] == user)
        assert [x - g[0] for x in g] == [x - w[0] for x in w]
    # pinned facts of the scenario itself
    assert got[(1, 1)][0] == 3 and got[(1, 2)][0] == 2
    assert got[(2, 1)][0] == 2 and got[(2, 2)][0] == 1
    assert got[(3, 1)][3] == 0
    # floor toward -inf: -1.001 * 1024 = -1025.024 -> -1026
    assert got[(3, 1)][4] == math.floor(-1.001 * 1024.0)


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double",
    )


def test_funnel_vs_bruteforce(spark):
    """Ordered funnel: step k needs an event STRICTLY after the
    earliest completion of step k-1.  Pinned: out-of-order completion
    does not count (purchase before click), equal timestamps do not
    advance, conv_ppm is exact integer DIV."""
    H = 3_600_000_000  # 1h in µs
    rows = [
        # user 1 completes all three in order
        _ev(1, 1, 0 * H, "view", 0.0),
        _ev(2, 1, 1 * H, "click", 0.0),
        _ev(3, 1, 2 * H, "purchase", 0.0),
        # user 2: purchase BEFORE click -> stops after click
        _ev(4, 2, 0 * H, "view", 0.0),
        _ev(5, 2, 1 * H, "purchase", 0.0),
        _ev(6, 2, 2 * H, "click", 0.0),
        # user 3: click at the SAME µs as view -> not strictly after
        _ev(7, 3, 0 * H, "view", 0.0),
        _ev(8, 3, 0 * H, "click", 0.0),
        # user 4: never views (click+purchase don't count)
        _ev(9, 4, 0 * H, "click", 0.0),
        _ev(10, 4, 1 * H, "purchase", 0.0),
        # user 5: views twice then clicks; earliest view is the anchor
        _ev(11, 5, 5 * H, "view", 0.0),
        _ev(12, 5, 0 * H, "view", 0.0),
        _ev(13, 5, 3 * H, "click", 0.0),
    ]
    out = funnel(_mk_events(spark, rows), steps=("view", "click", "purchase"))
    got = {r.step_idx: (r.step, r.n_users, r.conv_ppm) for r in out.collect()}
    # step0: users 1,2,3,5; step1 (click strictly after first view):
    # 1, 2, 5; step2 (purchase strictly after that click): 1 only
    assert got == {
        0: ("view", 4, 1_000_000),
        1: ("click", 3, 750_000),
        2: ("purchase", 1, 250_000),
    }


def test_funnel_empty_base(spark):
    rows = [_ev(1, 1, 0, "click", 0.0)]
    out = funnel(_mk_events(spark, rows), steps=("view", "click"))
    got = {r.step_idx: (r.n_users, r.conv_ppm) for r in out.collect()}
    assert got == {0: (0, 0), 1: (0, 0)}


def test_retention_vs_bruteforce(spark):
    """Cohort by UTC day of first event; distinct-user counts per
    (cohort_day, offset); a user active twice on one offset day counts
    once; cohort_type anchors on that event type only."""
    D = 86_400_000_000
    rows = [
        # user 1: first event day 0; active days 0, 0 (dup), 2
        _ev(1, 1, 0, "view", 0.0),
        _ev(2, 1, 3600_000_000, "click", 0.0),
        _ev(3, 1, 2 * D + 5, "view", 0.0),
        # user 2: first event day 0 (just before midnight); day 1 visit
        _ev(4, 2, D - 1, "view", 0.0),
        _ev(5, 2, D + 1, "click", 0.0),
        # user 3: first event day 1
        _ev(6, 3, D + 7, "signup", 0.0),
        _ev(7, 3, 3 * D, "purchase", 0.0),
    ]
    ev = _mk_events(spark, rows)
    base = int(T0.replace(tzinfo=dt.timezone.utc).timestamp()) // 86400
    got = {
        (r.cohort_day - base, r.day_offset): r.n_users
        for r in retention(ev).collect()
    }
    assert got == {(0, 0): 2, (0, 2): 1, (0, 1): 1, (1, 0): 1, (1, 2): 1}
    # cohort on signup: only user 3 has a cohort; their view on day 1
    # predates nothing (signup IS day 1), purchase lands at offset 2
    got_s = {
        (r.cohort_day - base, r.day_offset): r.n_users
        for r in retention(ev, cohort_type="signup").collect()
    }
    assert got_s == {(1, 0): 1, (1, 2): 1}


def test_event_pairs_within_vs_bruteforce(spark):
    """Temporal interval join vs a python double loop: inclusive
    bounds at BOTH ends, cross-bucket pairs found (the ring-1 case),
    directional vs symmetric windows, same-type self-pair exclusion."""
    from spatialjoincountovershells_spark.operators.events import (
        event_pairs_within,
    )

    S = 1_000_000  # 1s in µs
    W = 60  # window seconds
    rows = [
        # user 1: clicks at 0, 59, 61, 200; purchases at 59, 60, 121, 500
        _ev(1, 1, 0 * S, "click", 0.0),
        _ev(2, 1, 59 * S, "click", 0.0),
        _ev(3, 1, 61 * S, "click", 0.0),
        _ev(4, 1, 200 * S, "click", 0.0),
        _ev(10, 1, 59 * S, "purchase", 0.0),
        _ev(11, 1, 60 * S, "purchase", 0.0),   # exactly W after click 1
        _ev(12, 1, 121 * S, "purchase", 0.0),  # exactly W after click 3
        _ev(13, 1, 500 * S, "purchase", 0.0),
        # user 2: isolation across users
        _ev(20, 2, 0 * S, "click", 0.0),
        _ev(21, 2, 30 * S, "purchase", 0.0),
    ]
    ev = _mk_events(spark, rows)
    evs = [(r[0], int((r[1] - T0) / dt.timedelta(microseconds=1)), r[2], r[3])
           for r in rows]

    def brute(lt, rt, direction):
        out = set()
        for le, lus, lu, ltype in evs:
            if ltype != lt:
                continue
            for re_, rus, ru, rtype in evs:
                if rtype != rt or ru != lu or (lt == rt and le == re_):
                    continue
                d = rus - lus
                ok = (0 <= d <= W * S) if direction == "after" \
                    else (-W * S <= d <= W * S)
                if ok:
                    out.add((lu, le, re_, d))
        return out

    for direction in ("after", "both"):
        got = {
            (r.user_id, r.l_event_id, r.r_event_id, r.dt_us)
            for r in event_pairs_within(
                ev, "click", "purchase", W, direction=direction
            ).collect()
        }
        assert got == brute("click", "purchase", direction), direction
    # pinned facts: click@0 pairs with purchases 59,60 (60 inclusive);
    # click@61 pairs with 121 (exactly W); cross-bucket edges work
    after = brute("click", "purchase", "after")
    assert (1, 1, 10, 59 * S) in after and (1, 1, 11, 60 * S) in after
    assert (1, 3, 12, 60 * S) in after
    # same-type join excludes the self-pair but keeps the rest
    got_cc = {
        (r.l_event_id, r.r_event_id)
        for r in event_pairs_within(ev, "click", "click", W,
                                    direction="both").collect()
    }
    assert all(a != b for a, b in got_cc)
    assert (1, 2) in got_cc and (2, 1) in got_cc


def test_asof_join_vs_bruteforce(spark):
    """AS-OF backward join vs a python brute force.  Pinned edge
    cases: exact-ts right matches (ts_r == ts_l qualifies); two
    rights at the SAME ts resolve to the larger event_id; a left with
    no prior right gets -1 sentinels; tolerance discards stale
    matches but keeps the row; users are isolated."""
    from spatialjoincountovershells_spark.operators.events import asof_join

    S = 1_000_000
    rows = [
        # user 1: clicks (rights) at 10, 10, 50; purchases (lefts)
        # at 5 (no prior), 10 (exact-ts tie), 60, 200
        _ev(1, 1, 10 * S, "click", 0.0),
        _ev(2, 1, 10 * S, "click", 0.0),   # same ts, larger id wins
        _ev(3, 1, 50 * S, "click", 0.0),
        _ev(10, 1, 5 * S, "purchase", 0.0),
        _ev(11, 1, 10 * S, "purchase", 0.0),
        _ev(12, 1, 60 * S, "purchase", 0.0),
        _ev(13, 1, 200 * S, "purchase", 0.0),
        # user 2: right exists only for user 2
        _ev(20, 2, 0 * S, "click", 0.0),
        _ev(21, 2, 1 * S, "purchase", 0.0),
        # noise type is ignored entirely
        _ev(30, 1, 55 * S, "view", 0.0),
    ]
    ev = _mk_events(spark, rows)

    def brute(tol_s):
        out = {}
        evs = [(r[0], int((r[1] - T0) / dt.timedelta(microseconds=1)),
                r[2], r[3]) for r in rows]
        for le, lus, lu, lt in evs:
            if lt != "purchase":
                continue
            cands = [(rus, re_) for re_, rus, ru, rt in evs
                     if rt == "click" and ru == lu and rus <= lus]
            if not cands:
                out[le] = (lu, lus, -1, -1, -1)
                continue
            rus, rid = max(cands)
            if tol_s is not None and lus - rus > tol_s * S:
                out[le] = (lu, lus, -1, -1, -1)
            else:
                out[le] = (lu, lus, rid, rus, lus - rus)
        return out

    for tol in (None, 100):
        got = {
            r.event_id: (r.user_id, r.ts_us, r.match_id,
                         r.match_ts_us, r.lag_us)
            for r in asof_join(ev, "purchase", "click",
                               tolerance_s=tol).collect()
        }
        base = int(T0.replace(tzinfo=dt.timezone.utc)
                   .timestamp() * 1_000_000)
        want = {le: (lu, base + lus,
                     rid, (base + rus) if rus >= 0 else -1, lag)
                for le, (lu, lus, rid, rus, lag) in brute(tol).items()}
        assert got == want, tol
    # pinned: purchase@10 matched click id 2 (exact ts, larger id);
    # purchase@5 got -1; tol=100 drops purchase@200's match (lag 150s)


def test_rolling_counts_vs_bruteforce(spark):
    """Trailing-window features vs a python double loop.  Pinned:
    window [t-W, t] inclusive both ends; equal-ts events all count for
    each other (RANGE frame); own row counts; value quantized
    floor(v*1024) before summing; NULL value adds 0."""
    from spatialjoincountovershells_spark.operators.events import (
        rolling_counts,
    )

    S = 1_000_000
    rows = [
        _ev(1, 1, 0 * S, "view", 1.5),
        _ev(2, 1, 30 * S, "view", -0.3),
        _ev(3, 1, 60 * S, "view", 2.0),    # exactly W after event 1
        _ev(4, 1, 61 * S, "view", 0.0),    # event 1 just fell out
        _ev(5, 1, 61 * S, "view", 7.25),   # tied ts with 4
        _ev(9, 2, 45 * S, "view", 10.0),   # user isolation
    ]
    ev = _mk_events(spark, rows)
    W = 60
    got = {
        r.event_id: (r.n_60s, r.vq_60s)
        for r in rolling_counts(ev, windows_s=(W,)).collect()
    }
    evs = [(r[0], int((r[1] - T0) / dt.timedelta(microseconds=1)),
            r[2], r[4]) for r in rows]
    want = {}
    for eid, us, user, _v in evs:
        inw = [
            (e2, v2)
            for e2, us2, u2, v2 in evs
            if u2 == user and us - W * S <= us2 <= us
        ]
        want[eid] = (
            len(inw),
            sum(int(math.floor(v * 1024)) for _, v in inw),
        )
    assert got == want
    # pinned: event 3 still sees event 1 (exactly W, inclusive); events
    # 4 and 5 (tied ts) see each other plus 2 and 3, but not event 1
    assert got[3][0] == 3 and got[4][0] == 4 and got[5][0] == 4
