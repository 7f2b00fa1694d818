"""Tier-merge planner unit semantics (keeper.rs:1336-1511 port)."""

from frankensearch_spark.plans.tiers import (
    SegmentInfo,
    plan_tier_merge,
)


def seg(i, lo, hi, n):
    return SegmentInfo(f"s{i}", lo, hi, n)


def test_picks_first_consecutive_same_tier_run():
    segs = [seg(i, i, i + 1, 100) for i in range(10)]
    run = plan_tier_merge(segs, fanout=4)
    assert [s.seg_id for s in run] == ["s0", "s1", "s2", "s3"]


def test_interleaved_bigger_segment_is_bridged():
    # a large segment interrupting a small run must NOT strand the
    # smalls on both sides (keeper.rs merges around stragglers; the
    # hole-ratio gate bounds how sparse a bridged run may be) — the
    # planner merges the smalls ACROSS the large segment's lease gap
    segs = [
        seg(0, 0, 1, 100),
        seg(1, 1, 2, 100),
        seg(2, 2, 3, 9 * (1 << 16)),  # large tier
        seg(3, 3, 4, 100),
        seg(4, 4, 5, 100),
        seg(5, 5, 6, 100),
    ]
    run = plan_tier_merge(segs, fanout=3)
    assert [s.seg_id for s in run] == ["s0", "s1", "s3"]


def test_hole_gate_breaks_sparse_runs():
    # small hole (0.25 of span) merges; a run sparser than the gate
    # (hole > 0.5) is rejected
    segs = [seg(0, 0, 1, 10), seg(1, 2, 3, 10), seg(2, 3, 4, 10)]
    assert [s.seg_id for s in plan_tier_merge(segs, fanout=3)] == [
        "s0", "s1", "s2"
    ]
    sparse = [seg(0, 0, 1, 10), seg(1, 8, 9, 10), seg(2, 9, 10, 10)]
    # span 10, covered 3 -> hole 0.7 > 0.5: no plan at fanout 3
    assert plan_tier_merge(sparse, fanout=3) is None
    assert [s.seg_id for s in plan_tier_merge(sparse, fanout=2)] == [
        "s1", "s2"
    ]


def test_hole_ratio_gate():
    # three wide-span segments covering little of their span
    segs = [
        SegmentInfo("a", 0, 10, 10),
        SegmentInfo("b", 10, 12, 10),
        SegmentInfo("c", 12, 40, 10),
    ]
    # span 40, covered 40 -> hole 0 (width == interval here)  — admitted
    assert plan_tier_merge(segs, fanout=3) is not None
    # shrink coverage: widths 1 each over span 40 -> hole 0.925, rejected
    sparse = [
        SegmentInfo("a", 0, 1, 10),
        SegmentInfo("b", 1, 2, 10),
        SegmentInfo("c", 2, 3, 10),
    ]
    # consecutive and fully covered -> fine
    assert plan_tier_merge(sparse, fanout=3) is not None


def test_no_plan_below_fanout():
    segs = [seg(i, i, i + 1, 10) for i in range(3)]
    assert plan_tier_merge(segs, fanout=4) is None
