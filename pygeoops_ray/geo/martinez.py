"""Boolean operations on polygons: Martinez-Rueda-Feito sweep-line clipping.

From-scratch implementation of the published algorithm (F. Martinez, A. Rueda,
F. Feito, "A new algorithm for computing Boolean operations on polygons",
Computers & Geosciences 2009; structure also documented by the MIT-licensed
martinez polygon-clipping JS library). Handles the degenerate cases the
reference's GEOS ops rely on: shared edges, collinear overlaps, touching
rings.

Input/output: lists of polygons, each polygon = list of rings, each ring a
list/array of (x, y) with implicit closure. Operations: "intersection",
"union", "difference" (subject minus clipping), "xor", plus the n-ary
coverage-depth overlays (union_nary / difference_nary / intersection_nary).

Precondition (same contract as shapely/GEOS): rings must be VALID simple
polygons — no self-intersections and no vertex-on-edge pinches. Degenerate
pinched rings mislead both the two-operand in/out toggling and the n-ary
coverage counters (fuzz-verified: snapped star polygons with a vertex lying
exactly on another edge fail both paths, and ``make_valid`` repair restores
exact membership agreement). Repair invalid input with
``pygeoops_ray.geo.validity.make_valid`` first.
"""

from __future__ import annotations

import heapq
import itertools
import math

_SEQ = itertools.count()

__all__ = ["boolean_op", "union_nary", "difference_nary", "intersection_nary"]

NORMAL = 0
NON_CONTRIBUTING = 1
SAME_TRANSITION = 2
DIFFERENT_TRANSITION = 3

INTERSECTION = "intersection"
UNION = "union"
DIFFERENCE = "difference"
XOR = "xor"
NARY_UNION = "nary_union"  # n-ary union: nonzero coverage-depth semantics
NARY_DIFFERENCE = "nary_difference"  # subject-union minus clipping-union, one sweep
NARY_INTERSECTION = "nary_intersection"  # subject-union AND clipping-union, one sweep


def _signed_area(p0, p1, p2) -> float:
    return (p0[0] - p2[0]) * (p1[1] - p2[1]) - (p1[0] - p2[0]) * (p0[1] - p2[1])


class SweepEvent:
    __slots__ = (
        "p",
        "left",
        "other",
        "is_subject",
        "type",
        "in_out",
        "other_in_out",
        "prev_in_result",
        "in_result",
        "result_transition",
        "pos",
        "processed",
        "contour_id",
        "output_contour_id",
        "key",
        "delta",
        "cov_below",
        "delta_c",
        "cov_below_c",
    )

    def __init__(self, p, left, other, is_subject):
        self.p = p
        self.left = left
        self.other = other
        self.is_subject = is_subject
        self.type = NORMAL
        self.in_out = False
        self.other_in_out = False
        self.prev_in_result = None
        self.in_result = False
        self.result_transition = 0
        self.pos = 0
        self.processed = False
        self.contour_id = 0
        self.output_contour_id = -1
        self.delta = 0  # n-ary: subject-coverage change crossing this edge upward
        self.cov_below = 0  # n-ary: subject coverage depth just below this edge
        self.delta_c = 0  # n-ary: clipping-set coverage change (overlay ops)
        self.cov_below_c = 0  # n-ary: clipping coverage depth just below

    def is_below(self, p) -> bool:
        if self.left:
            return _signed_area(self.p, self.other.p, p) > 0
        return _signed_area(self.other.p, self.p, p) > 0

    def is_above(self, p) -> bool:
        return not self.is_below(p)

    def is_vertical(self) -> bool:
        return self.p[0] == self.other.p[0]

    def set_key(self):
        """Static heap key equivalent to compare_events' total order:
        (x, y, rights-first, direction pseudo-angle — ascending for left
        events / descending for right — subject-first on collinear ties, seq).

        Left events: e1 < e2 at the same point iff e1's direction angle is
        smaller (the lower segment). Right events: the reverse. Both verified
        against the comparator's signed-area derivation.
        """
        ox, oy = self.other.p
        if self.left:
            ang = math.atan2(oy - self.p[1], ox - self.p[0])
        else:
            ang = -math.atan2(self.p[1] - oy, self.p[0] - ox)
        self.key = (
            self.p[0],
            self.p[1],
            1 if self.left else 0,
            ang,
            0 if self.is_subject else 1,
            next(_SEQ),
        )

    def __lt__(self, other) -> bool:  # heapq ordering (≡ compare_events order)
        return self.key < other.key


def compare_events(e1: SweepEvent, e2: SweepEvent) -> int:
    if e1 is e2:
        return 0
    if e1.p[0] > e2.p[0]:
        return 1
    if e1.p[0] < e2.p[0]:
        return -1
    if e1.p[1] != e2.p[1]:
        return 1 if e1.p[1] > e2.p[1] else -1
    # same point: right endpoint events processed first
    if e1.left != e2.left:
        return 1 if e1.left else -1
    # same point, same side: the event whose segment is below comes first
    if _signed_area(e1.p, e1.other.p, e2.other.p) != 0:
        return 1 if not e1.is_below(e2.other.p) else -1
    # collinear: subject first
    return 1 if (not e1.is_subject and e2.is_subject) else -1


def compare_segments(le1: SweepEvent, le2: SweepEvent) -> int:
    """Sweep-line status ordering of two left events."""
    if le1 is le2:
        return 0
    if (
        _signed_area(le1.p, le1.other.p, le2.p) != 0
        or _signed_area(le1.p, le1.other.p, le2.other.p) != 0
    ):
        # segments not collinear: order by vertical position at the sweep
        if le1.p == le2.p:
            return -1 if le1.is_below(le2.other.p) else 1
        if le1.p[0] == le2.p[0]:
            return -1 if le1.p[1] < le2.p[1] else 1
        if compare_events(le1, le2) == 1:
            # le2 was inserted first
            s = _signed_area(le2.p, le2.other.p, le1.p)
            if s != 0:
                return 1 if s < 0 else -1
            # le1.p lies exactly ON le2: order by where le1 heads
            return 1 if le2.is_below(le1.other.p) else -1
        s = _signed_area(le1.p, le1.other.p, le2.p)
        if s != 0:
            return -1 if s > 0 else 1
        # le2.p lies exactly ON le1: order by where le2 heads
        return -1 if le1.is_below(le2.other.p) else 1
    # collinear segments
    if le1.is_subject == le2.is_subject:
        if le1.p == le2.p:
            if le1.other.p == le2.other.p:
                return 0
            return -1 if le1.contour_id < le2.contour_id else 1
        return 1 if compare_events(le1, le2) == 1 else -1
    return -1 if le1.is_subject else 1


def _cross(a, b) -> float:
    return a[0] * b[1] - a[1] * b[0]


_T_EPS = 1e-9  # parametric tolerance: a crossing a few ulps past an endpoint
# still counts (and snaps to it) — otherwise a vertex-on-edge division can be
# missed at insert time and discovered one event too late, with stale fields


def _segment_intersection(a1, a2, b1, b2):
    """0, 1 or 2 intersection points, endpoint-snapped (martinez-style)."""
    va = (a2[0] - a1[0], a2[1] - a1[1])
    vb = (b2[0] - b1[0], b2[1] - b1[1])
    e = (b1[0] - a1[0], b1[1] - a1[1])
    kross = _cross(va, vb)
    sqr_kross = kross * kross
    sqr_len_a = va[0] * va[0] + va[1] * va[1]
    if sqr_kross > 0:
        s = _cross(e, vb) / kross
        if s < -_T_EPS or s > 1 + _T_EPS:
            return []
        t = _cross(e, va) / kross
        if t < -_T_EPS or t > 1 + _T_EPS:
            return []
        s = 0.0 if s <= _T_EPS else (1.0 if s >= 1 - _T_EPS else s)
        t = 0.0 if t <= _T_EPS else (1.0 if t >= 1 - _T_EPS else t)
        # endpoint snaps return the ACTUAL endpoint tuple: recomputing it as
        # p + v rounds the last ulp, and a division at a 1-ulp-off "endpoint"
        # spawns degenerate micro-edges that desynchronize coincident chains
        if s == 0 or s == 1:
            return [a1 if s == 0 else a2]
        if t == 0 or t == 1:
            return [b1 if t == 0 else b2]
        return [_mid(a1, a2, s, va)]
    # parallel
    if _cross(e, va) != 0:
        return []
    # collinear: project b endpoints on a
    s0 = (va[0] * e[0] + va[1] * e[1]) / sqr_len_a
    e2 = (b2[0] - a1[0], b2[1] - a1[1])
    s1 = (va[0] * e2[0] + va[1] * e2[1]) / sqr_len_a
    smin, smax = min(s0, s1), max(s0, s1)
    lo, hi = max(0.0, smin), min(1.0, smax)
    if lo > hi:
        return []

    def _pt(param):
        # map the parameter back to the ORIGINAL endpoint it came from — the
        # recomputed projection differs in the last ulp (see endpoint snaps)
        if param == 0.0:
            return a1
        if param == 1.0:
            return a2
        if param == s0:
            return b1
        if param == s1:
            return b2
        return (a1[0] + param * va[0], a1[1] + param * va[1])

    if lo == hi:
        return [_pt(lo)]
    return [_pt(lo), _pt(hi)]


def _mid(p, q, t, v):
    if t == 0:
        return p
    if t == 1:
        return q
    return (p[0] + t * v[0], p[1] + t * v[1])


def _in_result(event: SweepEvent, operation: str) -> bool:
    t = event.type
    if t == NORMAL:
        if operation == INTERSECTION:
            return not event.other_in_out
        if operation == UNION:
            return event.other_in_out
        if operation == DIFFERENCE:
            return (event.is_subject and event.other_in_out) or (
                not event.is_subject and not event.other_in_out
            )
        return True  # XOR
    if t == SAME_TRANSITION:
        return operation in (INTERSECTION, UNION)
    if t == DIFFERENT_TRANSITION:
        return operation == DIFFERENCE
    return False


def _compute_fields(event: SweepEvent, prev: SweepEvent | None, operation: str):
    if prev is None:
        event.in_out = False
        event.other_in_out = True
    elif event.is_subject == prev.is_subject:
        event.in_out = not prev.in_out
        event.other_in_out = prev.other_in_out
    else:
        event.in_out = not prev.other_in_out
        event.other_in_out = (not prev.in_out) if prev.is_vertical() else prev.in_out
    if prev is not None:
        event.prev_in_result = (
            prev.prev_in_result if (not _in_result(prev, operation) or prev.is_vertical()) else prev
        )
    event.in_result = _in_result(event, operation)
    event.result_transition = _result_transition(event, operation) if event.in_result else 0


def _result_transition(event: SweepEvent, operation: str) -> int:
    """+1 if crossing this edge upward enters the result region, else -1."""
    this_in = not event.in_out
    that_in = not event.other_in_out
    if operation == INTERSECTION:
        is_in = this_in and that_in
    elif operation == UNION:
        is_in = this_in or that_in
    elif operation == XOR:
        is_in = this_in != that_in
    else:  # DIFFERENCE
        is_in = (this_in and not that_in) if event.is_subject else (that_in and not this_in)
    return 1 if is_in else -1


def _compute_fields_nary(event: SweepEvent, prev: SweepEvent | None):
    """n-ary union fields: nonzero coverage depth instead of the two-operand
    in_out/other_in_out pair. ``cov_below`` accumulates along the status line;
    an edge is a union boundary iff exactly one side has depth zero. A
    vertical prev contributes nothing to the region above it at the sweep's
    x+eps (its span lies behind the sweep), so its below-coverage passes
    through — the same convention as the two-operand other_in_out flip."""
    if prev is None:
        event.cov_below = 0
    elif prev.is_vertical():
        event.cov_below = prev.cov_below
    else:
        event.cov_below = prev.cov_below + prev.delta
    above = event.cov_below + event.delta
    event.in_result = event.delta != 0 and (event.cov_below == 0) != (above == 0)
    event.result_transition = (
        0 if not event.in_result else (1 if event.cov_below == 0 else -1)
    )
    if prev is not None:
        event.prev_in_result = (
            prev if (prev.in_result and not prev.is_vertical()) else prev.prev_in_result
        )


def _compute_fields_diff_nary(event: SweepEvent, prev: SweepEvent | None):
    """Two-counter overlay fields for NARY_DIFFERENCE: subject coverage and
    clipping coverage accumulate independently; the result region is
    (subject depth > 0) AND (clipping depth == 0); an edge is a boundary iff
    region membership differs across it. Vertical-prev pass-through as in
    the union variant."""
    if prev is None:
        event.cov_below = 0
        event.cov_below_c = 0
    elif prev.is_vertical():
        event.cov_below = prev.cov_below
        event.cov_below_c = prev.cov_below_c
    else:
        event.cov_below = prev.cov_below + prev.delta
        event.cov_below_c = prev.cov_below_c + prev.delta_c
    sb, cb = event.cov_below, event.cov_below_c
    r_below = sb > 0 and cb == 0
    r_above = (sb + event.delta) > 0 and (cb + event.delta_c) == 0
    event.in_result = (
        (event.delta != 0 or event.delta_c != 0) and r_below != r_above
    )
    event.result_transition = (
        0 if not event.in_result else (1 if not r_below else -1)
    )
    if prev is not None:
        event.prev_in_result = (
            prev if (prev.in_result and not prev.is_vertical()) else prev.prev_in_result
        )


def _compute_fields_isect_nary(event: SweepEvent, prev: SweepEvent | None):
    """Two-counter overlay fields for NARY_INTERSECTION: result region =
    (subject depth > 0) AND (clipping depth > 0)."""
    if prev is None:
        event.cov_below = 0
        event.cov_below_c = 0
    elif prev.is_vertical():
        event.cov_below = prev.cov_below
        event.cov_below_c = prev.cov_below_c
    else:
        event.cov_below = prev.cov_below + prev.delta
        event.cov_below_c = prev.cov_below_c + prev.delta_c
    sb, cb = event.cov_below, event.cov_below_c
    r_below = sb > 0 and cb > 0
    r_above = (sb + event.delta) > 0 and (cb + event.delta_c) > 0
    event.in_result = (
        (event.delta != 0 or event.delta_c != 0) and r_below != r_above
    )
    event.result_transition = (
        0 if not event.in_result else (1 if not r_below else -1)
    )
    if prev is not None:
        event.prev_in_result = (
            prev if (prev.in_result and not prev.is_vertical()) else prev.prev_in_result
        )


_SWEEP = {"cur": None, "dirty": False}  # current sweep point / staleness flag


def _divide_segment(se: SweepEvent, p, queue: list):
    r = SweepEvent(p, False, se, se.is_subject)
    l = SweepEvent(p, True, se.other, se.is_subject)
    r.contour_id = l.contour_id = se.contour_id
    l.delta = se.delta  # n-ary: both halves carry the edge's coverage deltas
    l.delta_c = se.delta_c
    if compare_events(l, se.other) > 0:
        # rounding degeneracy: flip
        se.other.left = True
        l.left = False
    se.other.other = l
    se.other = r
    # keys depend on p/left/other: (re)compute for everything touched
    l.set_key()
    r.set_key()
    l.other.set_key()  # the far right event (its left flag may have flipped)
    heapq.heappush(queue, (l.key, l))
    heapq.heappush(queue, (r.key, r))
    if p == _SWEEP["cur"]:
        # the re-queued left event lands AT the current sweep point: events
        # already processed at this point computed their coverage without it
        # (and without any fold it triggers) — flag for the relabel pass
        _SWEEP["dirty"] = True


def _possible_intersection(
    se1: SweepEvent, se2: SweepEvent, queue: list, nary: bool = False
) -> int:
    a1 = se1.p
    a2 = se1.other.p
    b1 = se2.p
    b2 = se2.other.p
    # cheap rejection on disjoint y-spans (x-spans always overlap for status
    # neighbors); the margin covers the parametric endpoint snap tolerance
    ay0, ay1 = (a1[1], a2[1]) if a1[1] <= a2[1] else (a2[1], a1[1])
    by0, by1 = (b1[1], b2[1]) if b1[1] <= b2[1] else (b2[1], b1[1])
    if ay0 > by1 + 1e-9 * (1.0 + abs(by1)) or by0 > ay1 + 1e-9 * (1.0 + abs(ay1)):
        return 0
    inter = _segment_intersection(a1, a2, b1, b2)
    n = len(inter)
    if n == 0:
        return 0
    if n == 1 and (se1.p == se2.p or se1.other.p == se2.other.p):
        return 0
    if n == 2 and not nary and se1.is_subject == se2.is_subject:
        # two-operand mode assumes each operand's rings don't self-overlap;
        # n-ary union MUST process same-set overlaps (delta folding)
        return 0
    if n == 1:
        ip = inter[0]
        if se1.p != ip and se1.other.p != ip:
            _divide_segment(se1, ip, queue)
        if se2.p != ip and se2.other.p != ip:
            _divide_segment(se2, ip, queue)
        return 1
    # segments overlap
    events = []
    left_coincide = se1.p == se2.p
    right_coincide = se1.other.p == se2.other.p
    if not left_coincide:
        if compare_events(se1, se2) == 1:
            events.extend([se2, se1])
        else:
            events.extend([se1, se2])
    if not right_coincide:
        if compare_events(se1.other, se2.other) == 1:
            events.extend([se2.other, se1.other])
        else:
            events.extend([se1.other, se2.other])

    if left_coincide:
        se2.type = NON_CONTRIBUTING
        if not nary:
            se1.type = (
                SAME_TRANSITION if se2.in_out == se1.in_out else DIFFERENT_TRANSITION
            )
        if not right_coincide:
            _divide_segment(events[1].other, events[0].p, queue)
        if nary:
            # fold the coincident edge's coverage deltas into the carrier
            # (AFTER the divide: the non-overlapping tail keeps its own)
            se1.delta += se2.delta
            se2.delta = 0
            se1.delta_c += se2.delta_c
            se2.delta_c = 0
        return 2
    if right_coincide:
        _divide_segment(events[0], events[1].p, queue)
        return 3
    if events[0] is not events[3].other:
        _divide_segment(events[0], events[1].p, queue)
        _divide_segment(events[1], events[2].p, queue)
        return 3
    _divide_segment(events[0], events[1].p, queue)
    _divide_segment(events[3].other, events[2].p, queue)
    return 3


def _fill_queue(subject, clipping, nary: bool = False):
    """Initial event list, numpy-batched across ALL rings at once: one
    concatenated coordinate array per operand set, vectorized edge
    normalization / arctan2 / orientation, keys assigned directly, one
    heapify at the end. Heap entries are (key, event) tuples so heapq
    compares plain tuples instead of dispatching SweepEvent.__lt__.

    With ``nary=True`` every left event additionally gets its coverage
    ``delta``: +1 iff the polygon's covered side lies above the (lo→hi
    normalized) edge. The covered side is LEFT of the ring's travel for a
    CCW shell or a CW hole (ring 0 = shell, the rest are holes — hole
    interiors subtract coverage), and "above" is left-of-travel when the
    ring traverses the edge lo→hi. Nonzero accumulation of these deltas
    along the sweep line is the n-ary union's region test."""
    import numpy as np

    queue: list = []
    contour_id = 0
    for polys, is_subject in ((subject, True), (clipping, False)):
        subj_flag = 0 if is_subject else 1
        arrs = []  # (pts, is_shell, contour_id)
        for poly in polys:
            for ring_idx, ring in enumerate(poly):
                contour_id += 1
                pts = np.asarray(ring, dtype=np.float64)
                if len(pts) > 1 and pts[0][0] == pts[-1][0] and pts[0][1] == pts[-1][1]:
                    pts = pts[:-1]
                if len(pts) < 3:
                    continue
                arrs.append((pts, ring_idx == 0, contour_id))
        if not arrs:
            continue
        P = np.concatenate([a for a, _, _ in arrs])
        sizes = np.array([len(a) for a, _, _ in arrs])
        starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        nxt_idx = np.arange(1, len(P) + 1)
        nxt_idx[starts + sizes - 1] = starts
        A, Bp = P, P[nxt_idx]
        keep = (A[:, 0] != Bp[:, 0]) | (A[:, 1] != Bp[:, 1])
        # left endpoint = lexicographic min of the edge
        a_first = (A[:, 0] < Bp[:, 0]) | ((A[:, 0] == Bp[:, 0]) & (A[:, 1] < Bp[:, 1]))
        lo = np.where(a_first[:, None], A, Bp)
        hi = np.where(a_first[:, None], Bp, A)
        ang_arr = np.arctan2(hi[:, 1] - lo[:, 1], hi[:, 0] - lo[:, 0])
        cid_edge = np.repeat(np.array([c for _, _, c in arrs]), sizes)
        if nary:
            crosses = A[:, 0] * Bp[:, 1] - Bp[:, 0] * A[:, 1]
            ccw = np.add.reduceat(crosses, starts) > 0
            shell = np.array([sh for _, sh, _ in arrs])
            covered_left = np.repeat(np.where(shell, ccw, ~ccw), sizes)
            deltas = np.where(a_first == covered_left, 1, -1)[keep]
            lo_k, hi_k = lo[keep], hi[keep]
            ang_k, cid_k = ang_arr[keep], cid_edge[keep]
            # PRE-FOLD bit-identical edges: coincident input edges (buffer
            # hulls share whole arc chains) fold their deltas into one
            # carrier BEFORE the sweep — mid-sweep coincidence detection
            # cannot be relied on for same-set chains once endpoint-snapped
            # divisions perturb exact collinearity by an ulp. Bundles whose
            # deltas annihilate (a top edge against a bottom edge) vanish
            # entirely; the rest enter the sweep once, so duplicated chains
            # can never desynchronize. Also strictly shrinks the event count.
            # (grouping via stable lexsort + reduceat: np.unique(axis=0)'s
            # void-view sort costs ~10x more on these small edge sets)
            ordr = np.lexsort((hi_k[:, 1], hi_k[:, 0], lo_k[:, 1], lo_k[:, 0]))
            quad = np.concatenate([lo_k, hi_k], axis=1)[ordr]
            new = np.empty(len(quad), dtype=bool)
            new[0] = True
            new[1:] = (quad[1:] != quad[:-1]).any(axis=1)
            grp_starts = np.nonzero(new)[0]
            folded = np.add.reduceat(deltas[ordr], grp_starts)
            nz = folded != 0
            # stable sort → group start holds the smallest original index
            sel = ordr[grp_starts][nz]
            order = np.argsort(sel)  # keep original edge order
            sel = sel[order]
            delta_arr = folded[nz][order].tolist()
            lo_l = lo_k[sel].tolist()
            hi_l = hi_k[sel].tolist()
            ang = ang_k[sel].tolist()
            cids = cid_k[sel].tolist()
        else:
            # native Python floats: numpy scalars would slow every downstream
            # tuple compare / signed-area call
            lo_l = lo[keep].tolist()
            hi_l = hi[keep].tolist()
            ang = ang_arr[keep].tolist()
            cids = cid_edge[keep].tolist()
        for i in range(len(lo_l)):
            p_lo = tuple(lo_l[i])
            p_hi = tuple(hi_l[i])
            el = SweepEvent(p_lo, True, None, is_subject)
            er = SweepEvent(p_hi, False, el, is_subject)
            el.other = er
            el.contour_id = er.contour_id = cids[i]
            if nary:
                # subject-set edges drive the subject counter; clipping-set
                # edges (overlay ops) the clipping counter
                if is_subject:
                    el.delta = delta_arr[i]
                else:
                    el.delta_c = delta_arr[i]
            ai = ang[i]
            el.key = (p_lo[0], p_lo[1], 1, ai, subj_flag, next(_SEQ))
            er.key = (p_hi[0], p_hi[1], 0, -ai, subj_flag, next(_SEQ))
            queue.append((el.key, el))
            queue.append((er.key, er))
    heapq.heapify(queue)
    return queue


def _subdivide(queue, operation, sbb_maxx, cbb_maxx) -> list[SweepEvent]:
    sorted_events: list[SweepEvent] = []
    sweep: list[SweepEvent] = []  # status line, ordered by compare_segments
    min_maxx = min(sbb_maxx, cbb_maxx)
    nary = operation in (NARY_UNION, NARY_DIFFERENCE, NARY_INTERSECTION)
    if operation == NARY_UNION:
        fields = lambda ev, prv: _compute_fields_nary(ev, prv)  # noqa: E731
    elif operation == NARY_DIFFERENCE:
        fields = lambda ev, prv: _compute_fields_diff_nary(ev, prv)  # noqa: E731
    elif operation == NARY_INTERSECTION:
        fields = lambda ev, prv: _compute_fields_isect_nary(ev, prv)  # noqa: E731
    else:
        fields = lambda ev, prv: _compute_fields(ev, prv, operation)  # noqa: E731
    _SWEEP["cur"] = None
    _SWEEP["dirty"] = False
    while queue:
        event = heapq.heappop(queue)[1]
        if (operation == INTERSECTION and event.p[0] > min_maxx) or (
            operation == DIFFERENCE and event.p[0] > sbb_maxx
        ):
            break
        _SWEEP["cur"] = event.p
        sorted_events.append(event)
        if event.left:
            # insert keeping sweep ordered by compare_segments
            lo, hi = 0, len(sweep)
            while lo < hi:
                mid = (lo + hi) // 2
                if compare_segments(sweep[mid], event) < 0:
                    lo = mid + 1
                else:
                    hi = mid
            sweep.insert(lo, event)
            prev = sweep[lo - 1] if lo > 0 else None
            nxt = sweep[lo + 1] if lo + 1 < len(sweep) else None
            fields(event, prev)
            if nxt is not None:
                if _possible_intersection(event, nxt, queue, nary) == 2:
                    fields(event, prev)
                    fields(nxt, event)
            if prev is not None:
                if _possible_intersection(prev, event, queue, nary) == 2:
                    pprev = sweep[lo - 2] if lo > 1 else None
                    fields(prev, pprev)
                    fields(event, prev)
        else:
            left = event.other
            try:
                pos = sweep.index(left)
            except ValueError:
                continue  # already removed (overlap degeneracy)
            prev = sweep[pos - 1] if pos > 0 else None
            nxt = sweep[pos + 1] if pos + 1 < len(sweep) else None
            sweep.pop(pos)
            if prev is not None and nxt is not None:
                if _possible_intersection(prev, nxt, queue, nary) == 2 and nary:
                    # two edges became coincident only after the removal: the
                    # fold happens with NO field recompute here, and events
                    # above them are stale — flag for the relabel pass
                    _SWEEP["dirty"] = True
    return sorted_events


def _order_events(sorted_events: list[SweepEvent]) -> list[SweepEvent]:
    result_events = [
        e for e in sorted_events if (e.left and e.in_result) or (not e.left and e.other.in_result)
    ]
    # events may be out of order due to segment division; the static key is a
    # total order consistent with compare_events
    result_events.sort(key=lambda e: e.key[:5])
    for i, e in enumerate(result_events):
        e.pos = i
    for i, e in enumerate(result_events):
        if not e.left:
            e.pos, e.other.pos = e.other.pos, e.pos
    return result_events


def _next_pos(pos: int, result_events, processed: set, orig_index: int) -> int:
    new_pos = pos + 1
    p = result_events[pos].p
    while new_pos < len(result_events) and result_events[new_pos].p == p:
        if new_pos not in processed:
            return new_pos
        new_pos += 1
    new_pos = pos - 1
    while new_pos > orig_index and new_pos in processed:
        new_pos -= 1
    return new_pos


def _connect_edges(sorted_events, operation):
    result_events = _order_events(sorted_events)
    processed: set[int] = set()
    contours: list[dict] = []
    for i in range(len(result_events)):
        if i in processed:
            continue
        contour = {"points": [], "hole_of": None, "depth": 0}
        contour_id = len(contours)
        event = result_events[i]
        # depth / hole assignment via the nearest previous edge in the result
        prev = event.prev_in_result
        lower_id = prev.output_contour_id if prev is not None else -1
        if prev is not None and 0 <= lower_id < len(contours):
            if prev.result_transition > 0:
                # previous edge is an out-in transition: same parent, +1 depth
                parent = contours[lower_id]
                contour["hole_of"] = lower_id
                contour["depth"] = parent["depth"] + 1
            else:
                lower = contours[lower_id]
                contour["hole_of"] = lower["hole_of"]
                contour["depth"] = lower["depth"]
        else:
            contour["hole_of"] = None
            contour["depth"] = 0

        pos = i
        orig_pos = i
        init_p = event.p
        contour["points"].append(init_p)
        while True:
            ev = result_events[pos]
            processed.add(pos)
            ev.processed = True
            ev.output_contour_id = contour_id
            # after the pos-swap in _order_events, .pos holds the counterpart's index
            pos = ev.pos
            processed.add(pos)
            result_events[pos].processed = True
            result_events[pos].output_contour_id = contour_id
            opoint = result_events[pos].p
            if opoint == init_p:
                break
            contour["points"].append(opoint)
            pos = _next_pos(pos, result_events, processed, orig_pos)
            if pos < 0 or pos == orig_pos:
                break
        contours.append(contour)
    return contours


def boolean_op(subject, clipping, operation: str):
    """Run a boolean op; returns list of polygons [shell, hole, ...] as point lists.

    subject/clipping: list of polygons; polygon = list of rings (point seqs).
    """
    has_subject = any(len(r) >= 3 for poly in subject for r in poly)
    has_clipping = any(len(r) >= 3 for poly in clipping for r in poly)
    if not has_subject:
        return [] if operation in (INTERSECTION, DIFFERENCE) else _copy(clipping)
    if not has_clipping:
        return [] if operation == INTERSECTION else _copy(subject)

    sbb = _bbox(subject)
    cbb = _bbox(clipping)
    # trivial rejection on disjoint bboxes
    if sbb[2] < cbb[0] or cbb[2] < sbb[0] or sbb[3] < cbb[1] or cbb[3] < sbb[1]:
        if operation == INTERSECTION:
            return []
        if operation == DIFFERENCE:
            return _copy(subject)
        return _copy(subject) + _copy(clipping)

    queue = _fill_queue(subject, clipping)
    sorted_events = _subdivide(queue, operation, sbb[2], cbb[2])
    contours = _connect_edges(sorted_events, operation)
    return _assemble(contours)


def union_nary(polygons):
    """Union of MANY possibly-overlapping polygons in ONE sweep.

    Coverage-depth (nonzero winding of the CCW-shell / CW-hole deltas)
    replaces the two-operand subject/clipping state: an edge is on the union
    boundary iff the coverage depth is zero on exactly one side. Coincident
    edges fold their deltas into one carrier, so shared boundaries emit one
    edge (+k vs 0 keeps it, +1/-1 annihilates it — a piece's top edge against
    another's bottom edge is interior and correctly dropped). Equivalent to a
    pairwise-union fold tree but a single O(E log E) pass instead of
    re-sweeping intermediate results at every tree level (~2-3x on
    buffer_by_m-style many-convex-piece unions).

    polygons: list of polygons, each a list of rings. Returns the same
    [shell, hole, ...] point-list form as boolean_op.
    """
    items = [p for p in polygons if any(len(r) >= 3 for r in p)]
    if not items:
        return []
    if len(items) == 1:
        return _copy(items)
    queue = _fill_queue(items, [], nary=True)
    inf = float("inf")
    sorted_events = _subdivide(queue, NARY_UNION, inf, inf)
    if _SWEEP["dirty"]:
        _relabel_nary(sorted_events, NARY_UNION)
    contours = _connect_edges(sorted_events, NARY_UNION)
    return _assemble(contours)


def _relabel_nary(sorted_events, operation) -> None:
    """Second, labeling-only sweep for the n-ary overlays.

    The subdivision pass can divide an edge AT the current sweep point,
    re-queuing a coincident piece AFTER later events at that same point have
    already computed their coverage from a pre-fold status — the classic
    martinez field-staleness hazard, which the coverage counters inherit
    (fuzz-found on snapped inputs whose near-collinear overlap chains divide
    at shared endpoints). After subdivision the edge set is FINAL, so a
    replay sweep that only inserts/removes and computes fields — no
    divisions, no re-queues — labels every edge from a complete, stable
    status. Keys are recomputed first: a division changes the stored
    direction angle of the shortened original event.
    """
    if operation == NARY_UNION:
        fields = _compute_fields_nary
    elif operation == NARY_DIFFERENCE:
        fields = _compute_fields_diff_nary
    else:
        fields = _compute_fields_isect_nary
    entries = []
    for e in sorted_events:
        if not e.left:
            continue
        e.prev_in_result = None
        e.set_key()
        e.other.set_key()
        entries.append((e.key, e))
        entries.append((e.other.key, e.other))
    heapq.heapify(entries)
    sweep: list[SweepEvent] = []
    while entries:
        event = heapq.heappop(entries)[1]
        if event.left:
            lo, hi = 0, len(sweep)
            while lo < hi:
                mid = (lo + hi) // 2
                if compare_segments(sweep[mid], event) < 0:
                    lo = mid + 1
                else:
                    hi = mid
            sweep.insert(lo, event)
            fields(event, sweep[lo - 1] if lo > 0 else None)
        else:
            try:
                sweep.remove(event.other)
            except ValueError:
                pass


def difference_nary(subject, clipping):
    """(union of subject polygons) MINUS (union of clipping polygons), in ONE
    sweep — replaces union_all(clipping) + boolean_op(subject, u, DIFFERENCE)
    (two sweeps plus an intermediate geometry) with a two-counter overlay:
    subject and clipping coverage depths accumulate independently along the
    status line and the result region is subject-depth > 0 AND clipping-depth
    == 0. Same pre-folding / coincidence handling as union_nary per set;
    cross-set coincident edges fold both deltas into one carrier mid-sweep.

    Inputs/outputs in boolean_op's [shell, hole, ...] point-list form.
    """
    subj = [p for p in subject if any(len(r) >= 3 for r in p)]
    clip = [p for p in clipping if any(len(r) >= 3 for r in p)]
    if not subj:
        return []
    if not clip:
        return union_nary(subj) if len(subj) > 1 else _copy(subj)
    queue = _fill_queue(subj, clip, nary=True)
    inf = float("inf")
    sorted_events = _subdivide(queue, NARY_DIFFERENCE, inf, inf)
    if _SWEEP["dirty"]:
        _relabel_nary(sorted_events, NARY_DIFFERENCE)
    contours = _connect_edges(sorted_events, NARY_DIFFERENCE)
    return _assemble(contours)


def intersection_nary(subject, clipping):
    """(union of subject polygons) AND (union of clipping polygons) in ONE
    two-counter overlay sweep; see difference_nary."""
    subj = [p for p in subject if any(len(r) >= 3 for r in p)]
    clip = [p for p in clipping if any(len(r) >= 3 for r in p)]
    if not subj or not clip:
        return []
    queue = _fill_queue(subj, clip, nary=True)
    inf = float("inf")
    sorted_events = _subdivide(queue, NARY_INTERSECTION, inf, inf)
    if _SWEEP["dirty"]:
        _relabel_nary(sorted_events, NARY_INTERSECTION)
    contours = _connect_edges(sorted_events, NARY_INTERSECTION)
    return _assemble(contours)


def _assemble(contours):
    """Contours → polygons: even depth → shell, odd → hole of its parent."""
    polygons: dict[int, list] = {}
    result = []
    for cid, c in enumerate(contours):
        pts = c["points"]
        if len(pts) < 3:
            continue
        ring = list(pts) + [pts[0]]
        if c["depth"] % 2 == 0:
            polygons[cid] = [ring]
            result.append(polygons[cid])
        else:
            parent = c["hole_of"]
            # walk up to an even-depth ancestor
            while parent is not None and contours[parent]["depth"] % 2 == 1:
                parent = contours[parent]["hole_of"]
            if parent is not None and parent in polygons:
                polygons[parent].append(ring)
            else:
                polygons[cid] = [ring]
                result.append(polygons[cid])
    return result


def _bbox(polys):
    import numpy as np

    minx = miny = float("inf")
    maxx = maxy = float("-inf")
    for poly in polys:
        for ring in poly:
            a = np.asarray(ring, dtype=np.float64)
            if len(a) == 0:
                continue
            lo = a.min(axis=0)
            hi = a.max(axis=0)
            minx = min(minx, lo[0])
            miny = min(miny, lo[1])
            maxx = max(maxx, hi[0])
            maxy = max(maxy, hi[1])
    return (minx, miny, maxx, maxy)


def _copy(polys):
    return [[list(r) for r in poly] for poly in polys]
