"""late_events watermark semantics on a hand trace."""

import datetime

import ray.data as rd


def test_late_events_hand_trace(ray_session):
    from tabbyray.ops.streaming import late_events

    t0 = datetime.datetime(2026, 1, 1)

    def at(s):
        return t0 + datetime.timedelta(seconds=s)

    # arrival order = event_id. user 1: times 100, 500, 120 (lag 380s,
    # late at 300s allowance? 500-300=200 watermark; 120 < 200 -> late,
    # lag 80), then 450 (wm 200, on time), then 90 (wm 200, lag 110).
    ev = rd.from_items([
        {"event_id": 1, "user_id": 1, "ts": at(100)},
        {"event_id": 2, "user_id": 1, "ts": at(500)},
        {"event_id": 3, "user_id": 1, "ts": at(120)},
        {"event_id": 4, "user_id": 1, "ts": at(450)},
        {"event_id": 5, "user_id": 1, "ts": at(90)},
        {"event_id": 6, "user_id": 2, "ts": at(10)},   # first arrival
    ]).repartition(3)
    out = (late_events(ev, allowed_lateness_s=300)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert list(out.late) == [0, 0, 1, 0, 1, 0]
    assert list(out.lag_s) == [0, 0, 80, 0, 110, 0]


def test_interval_coalesce_hand_case(ray_session):
    """Overlap merges, touching merges, gaps split; counts per span."""
    import ray.data as rd

    from tabbyray.ops.streaming import interval_coalesce

    iv = rd.from_items([
        {"k": 1, "lo": 0, "hi": 5},
        {"k": 1, "lo": 3, "hi": 8},    # overlaps -> same span
        {"k": 1, "lo": 8, "hi": 10},   # touches  -> same span
        {"k": 1, "lo": 12, "hi": 13},  # gap      -> new span
        {"k": 1, "lo": 1, "hi": 2},    # nested   -> same first span
        {"k": 2, "lo": 0, "hi": 1},
    ]).repartition(3)
    out = (interval_coalesce(iv, "k", "lo", "hi").to_pandas()
           .sort_values(["k", "span_lo"]).reset_index(drop=True))
    assert out.values.tolist() == [
        [1, 0, 10, 4], [1, 12, 13, 1], [2, 0, 1, 1]]
