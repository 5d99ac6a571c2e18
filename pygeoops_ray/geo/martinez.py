"""Boolean operations on polygons: Martinez-Rueda-Feito sweep-line clipping.

From-scratch implementation of the published algorithm (F. Martinez, A. Rueda,
F. Feito, "A new algorithm for computing Boolean operations on polygons",
Computers & Geosciences 2009; structure also documented by the MIT-licensed
martinez polygon-clipping JS library). Handles the degenerate cases the
reference's GEOS ops rely on: shared edges, collinear overlaps, touching
rings.

Input/output: lists of polygons, each polygon = list of rings, each ring a
list/array of (x, y) with implicit closure. Operations: "intersection",
"union", "difference" (subject minus clipping), "xor".
"""

from __future__ import annotations

import heapq
import itertools
import math

_SEQ = itertools.count()

__all__ = ["boolean_op"]

NORMAL = 0
NON_CONTRIBUTING = 1
SAME_TRANSITION = 2
DIFFERENT_TRANSITION = 3

INTERSECTION = "intersection"
UNION = "union"
DIFFERENCE = "difference"
XOR = "xor"


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
        if s == 0 or s == 1:
            return [_mid(a1, s, va)]
        if t == 0 or t == 1:
            return [_mid(b1, t, vb)]
        return [_mid(a1, s, va)]
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
    if lo == hi:
        return [_mid(a1, lo, va)]
    return [_mid(a1, lo, va), _mid(a1, hi, va)]


def _mid(p, t, v):
    if t == 0:
        return p
    if t == 1:
        return (p[0] + v[0], p[1] + v[1])
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


def _divide_segment(se: SweepEvent, p, queue: list):
    r = SweepEvent(p, False, se, se.is_subject)
    l = SweepEvent(p, True, se.other, se.is_subject)
    r.contour_id = l.contour_id = se.contour_id
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


def _possible_intersection(se1: SweepEvent, se2: SweepEvent, queue: list) -> int:
    inter = _segment_intersection(se1.p, se1.other.p, se2.p, se2.other.p)
    n = len(inter)
    if n == 0:
        return 0
    if n == 1 and (se1.p == se2.p or se1.other.p == se2.other.p):
        return 0
    if n == 2 and se1.is_subject == se2.is_subject:
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
        se1.type = SAME_TRANSITION if se2.in_out == se1.in_out else DIFFERENT_TRANSITION
        if not right_coincide:
            _divide_segment(events[1].other, events[0].p, queue)
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


def _fill_queue(subject, clipping):
    """Initial event list: numpy-batched per ring (one arctan2 per edge,
    lexicographic left-flags vectorized), keys assigned directly, one
    heapify at the end — no per-event heappush / atan2 / comparator work.
    Heap entries are (key, event) tuples so heapq compares plain tuples
    instead of dispatching SweepEvent.__lt__."""
    import numpy as np

    queue: list = []
    contour_id = 0
    for polys, is_subject in ((subject, True), (clipping, False)):
        subj_flag = 0 if is_subject else 1
        for poly in polys:
            for ring in poly:
                contour_id += 1
                pts = np.asarray(ring, dtype=np.float64)
                if len(pts) > 1 and pts[0][0] == pts[-1][0] and pts[0][1] == pts[-1][1]:
                    pts = pts[:-1]
                if len(pts) < 3:
                    continue
                if len(pts) >= 64:
                    nxt = np.roll(pts, -1, axis=0)
                    keep = (pts[:, 0] != nxt[:, 0]) | (pts[:, 1] != nxt[:, 1])
                    a, b = pts[keep], nxt[keep]
                    # left endpoint = lexicographic min of the edge
                    a_first = (a[:, 0] < b[:, 0]) | (
                        (a[:, 0] == b[:, 0]) & (a[:, 1] < b[:, 1])
                    )
                    lo = np.where(a_first[:, None], a, b)
                    hi = np.where(a_first[:, None], b, a)
                    ang_arr = np.arctan2(hi[:, 1] - lo[:, 1], hi[:, 0] - lo[:, 0])
                    # native Python floats: numpy scalars would slow every
                    # downstream tuple compare / signed-area call
                    lo_l, hi_l, ang = lo.tolist(), hi.tolist(), ang_arr.tolist()
                else:
                    # small rings: scalar path (numpy per-ring overhead loses)
                    pl = pts.tolist()
                    lo_l, hi_l, ang = [], [], []
                    m = len(pl)
                    for i in range(m):
                        p1 = pl[i]
                        p2 = pl[(i + 1) % m]
                        if p1 == p2:
                            continue
                        if p1 < p2:
                            plo, phi = p1, p2
                        else:
                            plo, phi = p2, p1
                        lo_l.append(plo)
                        hi_l.append(phi)
                        ang.append(math.atan2(phi[1] - plo[1], phi[0] - plo[0]))
                for i in range(len(lo_l)):
                    p_lo = tuple(lo_l[i])
                    p_hi = tuple(hi_l[i])
                    el = SweepEvent(p_lo, True, None, is_subject)
                    er = SweepEvent(p_hi, False, el, is_subject)
                    el.other = er
                    el.contour_id = er.contour_id = contour_id
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
    while queue:
        event = heapq.heappop(queue)[1]
        if (operation == INTERSECTION and event.p[0] > min_maxx) or (
            operation == DIFFERENCE and event.p[0] > sbb_maxx
        ):
            break
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
            _compute_fields(event, prev, operation)
            if nxt is not None:
                if _possible_intersection(event, nxt, queue) == 2:
                    _compute_fields(event, prev, operation)
                    _compute_fields(nxt, event, operation)
            if prev is not None:
                if _possible_intersection(prev, event, queue) == 2:
                    pprev = sweep[lo - 2] if lo > 1 else None
                    _compute_fields(prev, pprev, operation)
                    _compute_fields(event, prev, operation)
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
                _possible_intersection(prev, nxt, queue)
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

    # assemble: even depth → shell, odd → hole of its hole_of parent
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
    minx = miny = float("inf")
    maxx = maxy = float("-inf")
    for poly in polys:
        for ring in poly:
            for p in ring:
                minx = min(minx, p[0])
                miny = min(miny, p[1])
                maxx = max(maxx, p[0])
                maxy = max(maxy, p[1])
    return (minx, miny, maxx, maxy)


def _copy(polys):
    return [[list(r) for r in poly] for poly in polys]
