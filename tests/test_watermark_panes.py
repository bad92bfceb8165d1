"""AfterWatermark composite trigger with wall-clock LATE firings
(streaming.core.watermark_panes) — the operator that closes the last
SURVEY §4.4.1 residual. Pins:

- ON_TIME pane fires when the on-time watermark passes the window end,
  delivered in a DATA-LESS micro-batch (no data-carrying batch needed —
  the exact case late_firing_panes documents as unexpressible);
- a late-but-admissible replay arms a wall-clock pane that fires
  late_delay_ms later, labeled LATE, accumulating the full total;
- rows later than the allowed lateness never reach the operator
  (guaranteed drop against the delayed watermark);
- _interval_ms parses the watermark-delay grammar.
"""

import time

import pytest

from scio_spark.streaming.core import (
    StreamFixture,
    _interval_ms,
    state_partitions,
    watermark_panes,
)

T0 = "2024-01-01 00:{m:02d}:00"


def _ts(minute):
    import datetime as dt

    return dt.datetime(2024, 1, 1, 0, minute)


def _drive(spark, panes, until, deadline_s=60.0):
    rows: list = []

    def cap(df, _bid):
        rows.extend(df.collect())

    with state_partitions(spark, 2):
        q = (
            panes.writeStream.outputMode("update")
            .foreachBatch(cap)
            .trigger(processingTime="250 milliseconds")
            .start()
        )

    def wait(pred, deadline=deadline_s):
        end = time.time() + deadline
        while time.time() < end:
            if pred(rows):
                return True
            time.sleep(0.25)
        return False

    assert wait(until), f"predicate never satisfied; got {rows}"
    return rows, q, wait


def test_interval_ms_grammar():
    assert _interval_ms("30 minutes") == 1_800_000
    assert _interval_ms("1 hour") == 3_600_000
    assert _interval_ms("1 minute 30 seconds") == 90_000
    assert _interval_ms("500 milliseconds") == 500
    with pytest.raises(ValueError):
        _interval_ms("2 fortnights")
    # FULL-match strictness: a findall scan would read '0.5 seconds' as
    # 5 s while Spark's withWatermark applies 500 ms — a silent 10x
    # lateness disagreement; reject anything not integer-termed
    with pytest.raises(ValueError):
        _interval_ms("0.5 seconds")
    with pytest.raises(ValueError):
        _interval_ms("1 hour 3 blorps")
    with pytest.raises(ValueError):
        _interval_ms("")


def test_on_time_pane_fires_data_less_then_late_pane_accumulates(spark):
    """Batch 1: on-time elements (minute 0-9 window). Batch 2: a minute-40
    row advances the on-time watermark (lateness 20 min → delayed wm =
    minute 20) past the window end (minute 10) — the ON_TIME pane for the
    first window must fire in a later DATA-LESS batch. Then a late replay
    of the same window (admissible: minute 5 ≥ delayed wm would be
    dropped only past minute 20) arms a wall-clock LATE pane carrying the
    accumulated total."""
    f = StreamFixture(spark, "user string, ts timestamp, score int")
    f.add_batch([("u1", _ts(1), 10), ("u1", _ts(2), 5)])
    panes = watermark_panes(
        f.stream(),
        "ts",
        "10 minutes",
        "20 minutes",
        ["user"],
        "score",
        late_delay_ms=1500,
    )
    rows, q, wait = _drive(
        spark, panes, lambda rs: len(rs) >= 0
    )
    try:
        # nothing may fire before the watermark crosses: no early trigger
        time.sleep(2)
        assert rows == [], "no EARLY firings were configured"
        f.add_batch([("u9", _ts(40), 1)])  # on-time wm → 00:40 > 00:10 end
        assert wait(lambda rs: any(r.timing == "ON_TIME" for r in rs))
        on_time = [r for r in rows if r.timing == "ON_TIME"]
        assert [
            (r.user, r.pane_index, r.pane_value, r.total_so_far)
            for r in on_time
        ] == [("u1", 0, 15, 15)]
        assert on_time[0].window_start == _ts(0)
        # delayed wm is now 00:20, PAST the window end (00:10): the state
        # is evicted on the next sweep and a replay at 00:05 < wm is
        # dropped by Spark before the operator — the guaranteed
        # beyond-lateness drop. No pane may fire for it.
        f.add_batch([("u1", _ts(5), 100)])
        time.sleep(4)
        assert not any(r.timing == "LATE" for r in rows), (
            "a row later than the allowed lateness must be dropped, "
            f"got {rows}"
        )
    finally:
        q.stop()
        f.close()


def test_late_pane_fires_wall_clock_for_admissible_replay(spark):
    """Lateness wide enough (2 hours) that the hour-0 replay stays
    admissible after the on-time watermark passed the window end: the
    replay arms a wall-clock deadline and fires a LATE pane with the
    accumulated total 1.5 s later — off the data cadence."""
    f = StreamFixture(spark, "user string, ts timestamp, score int")
    f.add_batch([("u1", _ts(1), 10)])
    panes = watermark_panes(
        f.stream(),
        "ts",
        "10 minutes",
        "2 hours",
        ["user"],
        "score",
        late_delay_ms=1500,
    )
    rows, q, wait = _drive(spark, panes, lambda rs: len(rs) >= 0)
    try:
        # on-time wm → 00:40 > 00:10 end; delayed wm = 00:40 − 2h < 0, so
        # the window's state survives and hour-0 rows stay admissible
        f.add_batch([("u9", _ts(40), 1)])
        assert wait(
            lambda rs: any(r.user == "u1" and r.timing == "ON_TIME" for r in rs)
        )
        t_fired = time.time()
        f.add_batch([("u1", _ts(5), 7)])  # late-but-admissible replay
        assert wait(
            lambda rs: any(r.user == "u1" and r.timing == "LATE" for r in rs)
        )
        late = [r for r in rows if r.user == "u1" and r.timing == "LATE"]
        assert [
            (r.pane_index, r.pane_value, r.total_so_far) for r in late
        ] == [(1, 17, 17)], "LATE pane accumulates on-time + late elements"
        assert time.time() - t_fired >= 1.0, (
            "LATE pane must fire on the wall-clock delay, not on batch arrival"
        )
    finally:
        q.stop()
        f.close()


def test_early_firings_discarding_mode_and_on_time_sequence(spark):
    """withEarlyFirings + discardingFiredPanes: each early pane carries
    only the delta since the last firing; the ON_TIME pane then re-fires
    at the crossing with a ZERO delta (everything was already emitted
    early — Beam's possibly-empty on-time pane); pane_index counts all
    firings; total_so_far always accumulates."""
    f = StreamFixture(spark, "user string, ts timestamp, score int")
    f.add_batch([("u1", _ts(1), 10)])
    panes = watermark_panes(
        f.stream(),
        "ts",
        "10 minutes",
        "20 minutes",
        ["user"],
        "score",
        late_delay_ms=1000,
        early_delay_ms=1000,
        accumulating=False,
    )
    rows, q, wait = _drive(
        spark, panes, lambda rs: any(r.timing == "EARLY" for r in rs)
    )
    try:
        assert [
            (r.user, r.timing, r.pane_index, r.pane_value, r.total_so_far)
            for r in rows
        ] == [("u1", "EARLY", 0, 10, 10)]
        f.add_batch([("u1", _ts(2), 5)])  # second early pane: delta only
        assert wait(
            lambda rs: any(r.timing == "EARLY" and r.pane_index == 1 for r in rs)
        )
        assert (rows[1].pane_value, rows[1].total_so_far) == (5, 15)
        f.add_batch([("u9", _ts(40), 1)])  # on-time wm 00:40 > end 00:10
        assert wait(lambda rs: any(r.timing == "ON_TIME" for r in rs))
        on_time = [r for r in rows if r.timing == "ON_TIME"]
        assert [
            (r.user, r.pane_index, r.pane_value, r.total_so_far)
            for r in on_time
        ] == [("u1", 2, 0, 15)], (
            "discarding ON_TIME pane re-fires with zero delta after early "
            f"panes drained it; got {rows}"
        )
    finally:
        q.stop()
        f.close()


def test_eviction_flushes_an_armed_unfired_late_pane_exactly_once(spark):
    """A late pane armed just before the delayed watermark passes the
    window end must emit EXACTLY once — either its wall-clock deadline
    fires first or eviction flushes it as the final pane (Beam's isLast);
    both paths carry the same content, so the assertion is race-free."""
    f = StreamFixture(spark, "user string, ts timestamp, score int")
    f.add_batch([("u1", _ts(1), 10)])
    panes = watermark_panes(
        f.stream(),
        "ts",
        "10 minutes",
        "30 minutes",
        ["user"],
        "score",
        late_delay_ms=1000,
    )
    rows, q, wait = _drive(spark, panes, lambda rs: len(rs) >= 0)
    try:
        f.add_batch([("u9", _ts(35), 1)])  # on-time wm 00:35 > 00:10; delayed 00:05
        assert wait(
            lambda rs: any(r.user == "u1" and r.timing == "ON_TIME" for r in rs)
        )
        # arm a late pane, then immediately push the delayed wm past the
        # window end (00:45 − 30 min = 00:15 > 00:10) — eviction races the
        # 1 s late deadline
        f.add_batch([("u1", _ts(6), 7)])
        f.add_batch([("u9", _ts(45), 1)])
        assert wait(
            lambda rs: any(r.user == "u1" and r.timing == "LATE" for r in rs)
        )
        time.sleep(2)  # a double emission (flush + deadline) would land here
        late = [r for r in rows if r.user == "u1" and r.timing == "LATE"]
        assert [
            (r.pane_index, r.pane_value, r.total_so_far) for r in late
        ] == [(1, 17, 17)], f"late pane must emit exactly once; got {rows}"
    finally:
        q.stop()
        f.close()


# ---------------------------------------------------------------- machine
# Property tests of the pure state machine (_WatermarkPaneMachine) — the
# interleavings a wall-clock harness can't reach deterministically: data
# racing sweeps, watermark crossings between arrivals, eviction with and
# without an armed pane, discarding vs accumulating bookkeeping.

from hypothesis import given, settings, strategies as st  # noqa: E402

from scio_spark.streaming.core import _WatermarkPaneMachine  # noqa: E402

END_MS = 10_000
LATENESS = 5_000


class _Harness:
    """Models Spark's contract around the machine: one key, a single
    registered timeout re-armed per invocation, rows admitted only while
    the delayed watermark is before the window end."""

    def __init__(self, machine):
        self.m = machine
        self.clock = 0
        self.wm = 0
        self.state = None
        self.due_at = None
        self.emissions = []
        self.admitted = 0
        self.evicted = False

    def data(self, amount):
        if self.wm >= END_MS or self.evicted:
            return  # beyond-lateness rows never reach the operator
        st_ = self.state if self.state is not None else self.m.ZERO
        self.admitted += amount
        self.state, timeout = self.m.on_data(st_, amount, END_MS, self.clock)
        self.due_at = self.clock + timeout

    def advance(self, dt):
        target = self.clock + dt
        while self.due_at is not None and self.due_at <= target:
            self.clock = self.due_at
            new, pane, timeout = self.m.on_timeout(self.state, self.wm, self.clock)
            if pane is not None:
                self.emissions.append(pane)
            if new is None:
                self.state, self.due_at, self.evicted = None, None, True
            else:
                self.state, self.due_at = new, self.clock + timeout
        self.clock = target

    def raise_wm(self, to):
        self.wm = max(self.wm, to)


events = st.lists(
    st.one_of(
        st.tuples(st.just("data"), st.integers(1, 100)),
        st.tuples(st.just("advance"), st.integers(1, 2_000)),
        st.tuples(st.just("wm"), st.integers(0, 20_000)),
    ),
    max_size=30,
)


@settings(max_examples=200, deadline=None)
@given(evs=events, accumulating=st.booleans(), early=st.sampled_from([None, 500]))
def test_machine_invariants_under_random_interleavings(evs, accumulating, early):
    m = _WatermarkPaneMachine(LATENESS, 1_000, early, accumulating, 300)
    h = _Harness(m)
    for kind, v in evs:
        if kind == "data":
            h.data(v)
        elif kind == "advance":
            h.advance(v)
        else:
            h.raise_wm(v)
    # drain: cross the on-time watermark, sweep, then cross eviction
    h.raise_wm(END_MS - LATENESS)
    h.advance(10_000)
    had_data = h.admitted > 0
    h.raise_wm(END_MS)
    h.advance(10_000)

    timings = [e[0] for e in h.emissions]
    # one ON_TIME exactly when the window ever held data; EARLY strictly
    # before it; LATE strictly after
    assert timings.count("ON_TIME") == (1 if had_data else 0), h.emissions
    if "ON_TIME" in timings:
        i = timings.index("ON_TIME")
        assert all(t == "EARLY" for t in timings[:i])
        assert all(t == "LATE" for t in timings[i + 1:])
    # pane_index is the consecutive firing count
    assert [e[1] for e in h.emissions] == list(range(len(h.emissions)))
    # totals: non-decreasing, conserve the admitted sum by the final pane
    totals = [e[3] for e in h.emissions]
    assert totals == sorted(totals)
    if had_data:
        assert totals[-1] == h.admitted
        if accumulating:
            assert all(e[2] == e[3] for e in h.emissions)
        else:
            assert sum(e[2] for e in h.emissions) == h.admitted
    # the delayed watermark passed the end: any created state must be gone
    # (a key that never saw data never had state to evict)
    assert h.evicted == had_data
    assert h.state is None


from scio_spark.streaming.core import _ProcessingTimePaneMachine  # noqa: E402

DELAY = 1_000
EVICT_AFTER = 3_000


class _PTHarness:
    """Models the processing-time-pane operator contract: one key, one
    re-armed timeout, state recreated from ZERO after eviction."""

    def __init__(self, machine):
        self.m = machine
        self.clock = 0
        self.state = None
        self.due_at = None
        self.emissions = []  # (fire_time, pane_index, pane_value, total)
        self.arm_times = []  # wall-clock instant each pane was armed
        self.evictions = 0

    def data(self, amount):
        st_ = self.state if self.state is not None else self.m.ZERO
        if st_[3] != self.m.PANE:  # IDLE or EVICT: this element arms a pane
            self.arm_times.append(self.clock)
        self.state, timeout = self.m.on_data(st_, amount, self.clock)
        self.due_at = self.clock + timeout

    def advance(self, dt):
        target = self.clock + dt
        while self.due_at is not None and self.due_at <= target:
            self.clock = self.due_at
            new, pane, timeout = self.m.on_timeout(self.state, self.clock)
            if pane is not None:
                self.emissions.append((self.clock,) + pane)
            if new is None:
                self.state, self.due_at = None, None
                self.evictions += 1
            else:
                self.state = new
                self.due_at = None if timeout is None else self.clock + timeout
        self.clock = target


pt_events = st.lists(
    st.one_of(
        st.tuples(st.just("data"), st.integers(1, 100)),
        st.tuples(st.just("advance"), st.integers(1, 2_500)),
    ),
    max_size=40,
)


@settings(max_examples=200, deadline=None)
@given(evs=pt_events, accumulating=st.booleans(), evict=st.booleans())
def test_processing_time_machine_invariants(evs, accumulating, evict):
    m = _ProcessingTimePaneMachine(
        DELAY, accumulating, EVICT_AFTER if evict else None
    )
    h = _PTHarness(m)
    total_fed = 0
    for kind, v in evs:
        if kind == "data":
            h.data(v)
            total_fed += v
        else:
            h.advance(v)
    h.advance(DELAY + EVICT_AFTER + 1)  # drain: flush any armed pane

    # every pane fires EXACTLY delay after the element that armed it —
    # pastFirstElementInPane, never a debounce (later elements collapse
    # silently without extending the deadline)
    assert len(h.emissions) == len(h.arm_times)
    for (fired_at, *_), armed_at in zip(h.emissions, h.arm_times):
        assert fired_at == armed_at + DELAY
    # totals: conservation across the whole run — the last pane of the
    # run carries everything fed since the last eviction, and each pane's
    # bookkeeping matches its mode
    gen_start_total = 0
    prev_total = 0
    for _, pane_index, pane_value, total in h.emissions:
        if pane_index == 0:  # new generation (first pane or post-eviction)
            gen_start_total, prev_total = 0, 0
        if accumulating:
            assert pane_value == total
        else:
            assert pane_value == total - prev_total
        assert total >= prev_total
        prev_total = total
    if not evict:
        # no eviction: totals accumulate forever and the final pane saw
        # every element (the drain flushed the last armed pane)
        if h.emissions:
            assert h.emissions[-1][3] == total_fed
        else:
            assert total_fed == 0
        assert h.evictions == 0
    else:
        # with eviction, an idle key's state is dropped after the window;
        # the drain guarantees the final state is evicted or never existed
        assert h.state is None
