"""Minimal-interval algebra — the full ``queries/intervals`` package.

Reference: ``lucene/queries/src/java/org/apache/lucene/queries/intervals``.
The factory surface (Intervals.java:69-645) builds an IntervalsSource
tree with BUILD-TIME rewrites (adjacent/count deduplication into
RepeatingIntervalsSource, disjunction pull-up for block/containing/
notContaining/containedBy/notContainedBy/maxgaps, the derived forms
unorderedNoOverlaps = or(ordered(a,b), ordered(b,a)) :446, within =
containedBy(s, extend(r, p, p)) :509, notWithin = nonOverlapping(m,
extend(s, p, p)) :494, before/after via zero-width OffsetIntervalsSource
points :582-596, atLeast(n-of-n) = unordered :567); per-document
evaluation then runs the lazy minimal-interval iterators.

This module transcribes every iterator literally (OrderedIntervalIterator
chain + minimization, the Unordered/MinimumShouldMatch priority-queue
window walk with the monotone queueEnd right extreme, Disjunction's
(end asc, start desc) queue with containment suppression, the
Filtering/Relative two-cursor loops of ContainedBy/Containing/
Overlapping/NonOverlapping/NotContaining/NotContainedBy, Block exact
adjacency, Extended/Offset clamping, DuplicateIntervalIterator's sliding
window INCLUDING its inverted width() quirk
RepeatingIntervalsSource.java:161 ``cache[pos*2] - cache[pos*2+1] + 1``)
so the emitted interval sequences, gaps() and width() values match the
reference bit for bit.  Gaps: ordered/unordered/MSM slop = window width
- sum of sub widths (OrderedIntervalsSource.java:165-170); filters and
extend delegate gaps to the wrapped iterator.

Execution shape: the per-doc evaluation runs only on candidate docs from
the tree's docID approximation (conjunction = intersection, disjunction
= union, difference = minuend — ConjunctionIntervalsSource /
DisjunctionIntervalsSource.approximation), which the caller computes
from the posting lists; position lists per (doc, term) come from the
positional index's packed keys, exactly like the phrase machinery.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass

import numpy as np

NO_MORE = 2**31 - 1                  # IntervalIterator.NO_MORE_INTERVALS
_MAX_CLAUSES = 1024                  # IndexSearcher.getMaxClauseCount()
DEFAULT_MAX_EXPANSIONS = 128         # Intervals.DEFAULT_MAX_EXPANSIONS


# ---------------------------------------------------------------------------
# AST


@dataclass(frozen=True)
class Src:
    kind: str
    subs: tuple = ()
    term: str | None = None
    a: int = 0                       # generic int params (width/gaps/...)
    b: int = 0
    flag: bool = False               # or-rewrite / offset-before
    field: str | None = None         # fixfield
    name: str | None = None          # repeating display name

    def min_extent(self) -> int:
        k = self.kind
        if k == "term":
            return 1
        if k in ("ordered", "unordered", "block"):
            return sum(s.min_extent() for s in self.subs)
        if k == "or":
            return min(s.min_extent() for s in self.subs)
        if k == "repeat":
            return self.subs[0].min_extent()
        if k in ("maxwidth", "maxgaps"):
            return self.subs[0].min_extent()
        if k == "extend":
            m = self.a + self.subs[0].min_extent() + self.b
            return NO_MORE if m < 0 or m > NO_MORE else m
        if k == "offset":
            return 1
        if k in ("containing", "not_containing"):
            return self.subs[0].min_extent()
        if k in ("contained_by", "not_contained_by", "overlapping",
                 "non_overlapping"):
            return self.subs[0].min_extent()
        if k == "msm":
            ext = sorted(s.min_extent() for s in self.subs)
            return sum(ext[: self.a])
        if k == "fixfield":
            return self.subs[0].min_extent()
        if k == "nomatch":
            return 0
        if k == "multiterm":
            return 1
        raise ValueError(k)

    def pull_up(self) -> list["Src"]:
        """pullUpDisjunctions() per node type."""
        k = self.kind
        if k == "or":
            return list(self.subs) if self.flag else [self]
        if k in ("ordered", "unordered"):
            ctor = ordered if k == "ordered" else unordered
            return _pull_up_list(list(self.subs), lambda ss: ctor(*ss))
        if k == "maxwidth":
            return _pull_up_one(self.subs[0],
                                lambda s: Src("maxwidth", (s,), a=self.a))
        if k == "extend":
            inner = self.subs[0].pull_up()
            if len(inner) == 0:
                return [self]
            return [Src("extend", (s,), a=self.a, b=self.b) for s in inner]
        if k == "fixfield":
            inner = self.subs[0].pull_up()
            if len(inner) == 1:
                return [self]
            return [Src("fixfield", (s,), field=self.field) for s in inner]
        if k == "containing":
            return _pull_up_one(
                self.subs[0], lambda s: Src("containing",
                                            (s, self.subs[1])))
        if k == "contained_by":
            return _pull_up_one(
                self.subs[1], lambda s: Src("contained_by",
                                            (self.subs[0], s)))
        if k == "overlapping":
            return _pull_up_list(
                [self.subs[0], self.subs[1]],
                lambda ss: Src("overlapping", (ss[0], ss[1])))
        # block/repeat/msm/nonoverlapping/not_*/offset/maxgaps/term/
        # multiterm: singleton (Disjunctions already pulled up in
        # build, or the node is opaque to pull-up)
        return [self]


def _split_disjunctions(source: Src) -> list[Src]:
    """Disjunctions.splitDisjunctions (Disjunctions.java:78): group
    minExtent==1 disjuncts into one or() clause."""
    singles, nons = [], []
    for d in source.pull_up():
        (singles if d.min_extent() == 1 else nons).append(d)
    out = []
    if singles:
        out.append(or_(*singles))
    out.extend(nons)
    return out


def _pull_up_one(source: Src, fn) -> list[Src]:
    ds = _split_disjunctions(source)
    return [fn(d) for d in ds]


def _pull_up_list(sources: list[Src], fn) -> list[Src]:
    """Disjunctions.pullUp over a source list (Disjunctions.java:33):
    cartesian expansion of the per-position disjunct splits."""
    rewritten: list[list[Src]] = [[]]
    for source in sources:
        ds = _split_disjunctions(source)
        if len(ds) == 1:
            for l in rewritten:
                l.append(ds[0])
        else:
            if len(rewritten) * len(ds) > _MAX_CLAUSES:
                raise ValueError("Too many disjunctions to expand")
            rewritten = [sub + [d] for d in ds for sub in rewritten]
    return [fn(l) for l in rewritten]


# --- factory surface (Intervals.java), with build-time rewrites ---

def term(t: str) -> Src:
    return Src("term", term=t)


def _dedup_adjacent(sources: list[Src]) -> list[Src]:
    """OrderedIntervalsSource.deduplicate (:41-57): adjacent equal runs
    collapse to RepeatingIntervalsSource."""
    out, cur = [], []
    for s in sources:
        if not cur or cur[0] == s:
            cur.append(s)
        else:
            out.append(_repeat(cur[0], len(cur)))
            cur = [s]
    out.append(_repeat(cur[0], len(cur)))
    if len(out) == 1 and out[0].kind == "repeat":
        out[0] = Src("repeat", out[0].subs, a=out[0].a, name="ORDERED")
    return out


def _repeat(s: Src, n: int) -> Src:
    return s if n == 1 else Src("repeat", (s,), a=n)


def ordered(*sources: Src) -> Src:
    ss = list(sources)
    if len(ss) == 1:
        return ss[0]
    dd = _dedup_adjacent(ss)
    if len(dd) == 1:
        return dd[0]
    return Src("ordered", tuple(dd))


def unordered(*sources: Src) -> Src:
    ss = list(sources)
    if len(ss) == 1:
        return ss[0]
    # UnorderedIntervalsSource.deduplicate (:45-57): count map,
    # insertion-ordered
    counts: dict[Src, int] = {}
    for s in ss:
        counts[s] = counts.get(s, 0) + 1
    dd = [_repeat(s, n) for s, n in counts.items()]
    if len(dd) == 1:
        if dd[0].kind == "repeat":
            return Src("repeat", dd[0].subs, a=dd[0].a, name="UNORDERED")
        return dd[0]
    return Src("unordered", tuple(dd))


def phrase(*sources) -> Src:
    """Intervals.phrase — BlockIntervalsSource.build (:30-35): single
    passes through, else or(pullUp(subs, Block::new))."""
    ss = [term(s) if isinstance(s, str) else s for s in sources]
    if len(ss) == 1:
        return ss[0]
    return or_(*_pull_up_list(ss, lambda l: Src("block", tuple(l))))


def or_(*sources: Src, rewrite: bool = True) -> Src:
    """DisjunctionIntervalsSource.create (:43-50) with flatten
    (simplify, :58-68; deterministic order here instead of the
    reference's HashSet — emission is order-insensitive)."""
    flat: list[Src] = []
    for s in sources:
        if s.kind == "or" and s.flag:
            for x in s.subs:
                if x not in flat:
                    flat.append(x)
        elif s not in flat:
            flat.append(s)
    if len(flat) == 1:
        return flat[0]
    return Src("or", tuple(flat), flag=rewrite)


def maxwidth(width: int, sub: Src) -> Src:
    return Src("maxwidth", (sub,), a=width)


def maxgaps(gaps: int, sub: Src) -> Src:
    """FilteredIntervalsSource.maxGaps (:31-36): or() of per-disjunct
    MAXGAPS wrappers."""
    return or_(*[Src("maxgaps", (s,), a=gaps) for s in sub.pull_up()])


def extend(sub: Src, before: int, after: int) -> Src:
    return Src("extend", (sub,), a=before, b=after)


def fixfield(field_name: str, sub: Src) -> Src:
    return Src("fixfield", (sub,), field=field_name)


def containing(big: Src, small: Src) -> Src:
    return or_(*_pull_up_one(big, lambda s: Src("containing", (s, small))))


def contained_by(small: Src, big: Src) -> Src:
    return or_(*_pull_up_one(big,
                             lambda s: Src("contained_by", (small, s))))


def not_containing(minuend: Src, subtrahend: Src) -> Src:
    return or_(*_pull_up_one(
        minuend, lambda s: Src("not_containing", (s, subtrahend))))


def not_contained_by(minuend: Src, subtrahend: Src) -> Src:
    return or_(*_pull_up_one(
        subtrahend, lambda s: Src("not_contained_by", (minuend, s))))


def overlapping(source: Src, reference: Src) -> Src:
    return Src("overlapping", (source, reference))


def non_overlapping(minuend: Src, subtrahend: Src) -> Src:
    return Src("non_overlapping", (minuend, subtrahend))


def unordered_no_overlaps(a: Src, b: Src) -> Src:
    return or_(ordered(a, b), ordered(b, a))


def within(source: Src, positions: int, reference: Src) -> Src:
    return contained_by(source, extend(reference, positions, positions))


def not_within(minuend: Src, positions: int, subtrahend: Src) -> Src:
    return non_overlapping(minuend,
                           extend(subtrahend, positions, positions))


def before(source: Src, reference: Src) -> Src:
    return contained_by(
        source, extend(Src("offset", (reference,), flag=True),
                       NO_MORE, 0))


def after(source: Src, reference: Src) -> Src:
    return contained_by(
        source, extend(Src("offset", (reference,), flag=False),
                       0, NO_MORE))


def at_least(min_should_match: int, *sources: Src) -> Src:
    if min_should_match == len(sources):
        return unordered(*sources)
    if min_should_match > len(sources):
        return no_intervals("too few sources")
    return Src("msm", tuple(sources), a=min_should_match)


def no_intervals(reason: str) -> Src:
    return Src("nomatch", name=reason)


# ---------------------------------------------------------------------------
# Per-document iterators (literal transcriptions)


class _It:
    """Base: list-backed leaf iterator."""

    __slots__ = ("iv", "i", "seq")

    def __init__(self, intervals):
        self.iv = intervals          # list of (start, end, gaps, width)
        self.i = -1

    def start(self):
        if self.i < 0:
            return -1
        if self.i >= len(self.iv):
            return NO_MORE
        return self.iv[self.i][0]

    def end(self):
        if self.i < 0:
            return -1
        if self.i >= len(self.iv):
            return NO_MORE
        return self.iv[self.i][1]

    def gaps(self):
        if 0 <= self.i < len(self.iv):
            return self.iv[self.i][2]
        return 0

    def width(self):
        if 0 <= self.i < len(self.iv):
            return self.iv[self.i][3]
        return self.end() - self.start() + 1

    def next_interval(self):
        self.i += 1
        return self.start()


def _drain(it) -> list:
    out = []
    while it.next_interval() != NO_MORE:
        out.append((it.start(), it.end(), it.gaps(), it.width()))
    return out


class _HeapPQ:
    """Lucene PriorityQueue stand-in: heapq keyed by a comparator key
    plus an insertion sequence number as the final tiebreak."""

    __slots__ = ("h", "key", "n")

    def __init__(self, key):
        self.h = []
        self.key = key
        self.n = 0

    def add(self, it):
        heapq.heappush(self.h, (self.key(it), self.n, it))
        self.n += 1

    def pop(self):
        return heapq.heappop(self.h)[2] if self.h else None

    def top(self):
        return self.h[0][2] if self.h else None

    def __len__(self):
        return len(self.h)

    def __iter__(self):
        for _, _, it in self.h:
            yield it


class _StatefulIt:
    """Base for literal stateful iterator transcriptions; provides the
    list-draining shim that the combinators consume."""

    def gaps(self):
        raise NotImplementedError

    def width(self):
        return self.end() - self.start() + 1

    def drain(self) -> list:
        out = []
        while self.next_interval() != NO_MORE:
            out.append((self.start(), self.end(), self.gaps(),
                        self.width()))
        return out


class _OrderedStateIt(_StatefulIt):
    """OrderedIntervalIterator (:104-194), literal."""

    def __init__(self, subs):
        self.subs = subs
        self._start = self._end = self._slop = -1
        self.i = 1
        subs[0].next_interval()               # reset()

    def start(self):
        return self._start

    def end(self):
        return self._end

    def gaps(self):
        return self._slop

    def next_interval(self):
        subs = self.subs
        self._start = self._end = self._slop = NO_MORE
        last_start = NO_MORE                   # Integer.MAX_VALUE
        minimizing = False
        current_index = self.i
        while True:
            prev_end = subs[current_index - 1].end()
            while True:
                if prev_end >= last_start:
                    self.i = current_index
                    return self._start
                if current_index == len(subs):
                    break
                cur = subs[current_index]
                if minimizing and cur.start() > prev_end:
                    break
                while True:                    # do/while
                    if cur.end() >= last_start:
                        self.i = current_index
                        return self._start
                    cur_start = cur.next_interval()
                    if cur_start == NO_MORE:
                        self.i = current_index
                        return self._start
                    if not (cur_start <= prev_end):
                        break
                current_index += 1
                prev_end = cur.end()
            first = subs[0]
            start = first.start()
            self._start = start
            if start == NO_MORE:
                self.i = current_index
                self._end = NO_MORE
                return NO_MORE
            last = subs[-1]
            end = last.end()
            self._end = end
            slop = end - start + 1
            for s in subs:
                slop -= s.width()
            self._slop = slop
            current_index = 1
            if first.next_interval() == NO_MORE:
                self.i = current_index
                return self._start
            last_start = last.start()
            minimizing = True


class _OrderedIt(_It):
    def __init__(self, subs):
        super().__init__(_OrderedStateIt(subs).drain())


class _UnorderedStateIt(_StatefulIt):
    """UnorderedIntervalIterator (:101-180), literal."""

    def __init__(self, subs):
        self.subs = subs
        self.queue = _HeapPQ(lambda it: (it.start(), -it.end()))
        self.queue_end = -1
        self._start = self._end = -1
        self._slop = 0
        for it in subs:                       # reset()
            if it.next_interval() == NO_MORE:
                break
            self.queue.add(it)
            self.queue_end = max(self.queue_end, it.end())

    def start(self):
        return self._start

    def end(self):
        return self._end

    def gaps(self):
        return self._slop

    def next_interval(self):
        queue, subs = self.queue, self.subs
        while (len(queue) == len(subs)
               and queue.top().start() == self._start):
            it = queue.pop()
            if it.next_interval() != NO_MORE:
                queue.add(it)
                self.queue_end = max(self.queue_end, it.end())
        if len(queue) < len(subs):
            self._start = self._end = NO_MORE
            return NO_MORE
        while True:                           # do/while: minimize
            self._start = queue.top().start()
            self._end = self.queue_end
            slop = self._end - self._start + 1
            for it in subs:
                slop -= it.width()
            self._slop = slop
            if queue.top().end() == self._end:
                return self._start
            it = queue.pop()
            if it.next_interval() != NO_MORE:
                queue.add(it)
                self.queue_end = max(self.queue_end, it.end())
            if not (len(queue) == len(subs)
                    and self._end == self.queue_end):
                return self._start


class _UnorderedIt(_It):
    def __init__(self, subs):
        super().__init__(_UnorderedStateIt(subs).drain())


class _BlockIt(_It):
    """BlockIntervalIterator (:92-135): exact adjacency; gaps 0."""

    def __init__(self, subs):
        out = []
        while True:
            if subs[0].next_interval() == NO_MORE:
                break
            i = 1
            dead = False
            while i < len(subs):
                while subs[i].start() <= subs[i - 1].end():
                    if subs[i].next_interval() == NO_MORE:
                        dead = True
                        break
                if dead:
                    break
                if subs[i].start() == subs[i - 1].end() + 1:
                    i += 1
                else:
                    if subs[0].next_interval() == NO_MORE:
                        dead = True
                        break
                    i = 1
            if dead:
                break
            s, e = subs[0].start(), subs[-1].end()
            out.append((s, e, 0, e - s + 1))
        super().__init__(out)


class _DisjunctionIt(_It):
    """DisjunctionIntervalIterator (:154-244): (end asc, start desc)
    queue; intervals containing an emitted interval are suppressed."""

    def __init__(self, subs):
        out = []
        queue = _HeapPQ(lambda it: (it.end(), -it.start()))
        for it in subs:                       # reset()
            if it.next_interval() != NO_MORE:
                queue.add(it)
        current = None
        while True:
            if current is None:
                if len(queue) == 0:
                    break
                current = queue.top()
            else:
                s, e = current.start(), current.end()
                while len(queue) and (s >= queue.top().start()
                                      and e <= queue.top().end()):
                    it = queue.pop()
                    if it.next_interval() != NO_MORE:
                        queue.add(it)
                if len(queue) == 0:
                    break
                current = queue.top()
            out.append((current.start(), current.end(), current.gaps(),
                        current.width()))
        super().__init__(out)


class _RepeatIt(_It):
    """DuplicateIntervalIterator (:130-210): sliding window of n
    consecutive sub intervals, no minimization; width() reproduces the
    reference's inverted subtraction (:161) so gaps() matches too."""

    def __init__(self, sub: _It, n: int):
        raw = _drain(sub)
        out = []
        for i in range(len(raw) - n + 1):
            win = raw[i:i + n]
            s, e = win[0][0], win[-1][1]
            width = sum(w[0] - w[1] + 1 for w in win)   # quirk: start-end+1
            gaps = (e - s + 1) - width
            out.append((s, e, gaps, width))
        super().__init__(out)


class _MsmStateIt(_StatefulIt):
    """MinimumShouldMatchIntervalIterator (:157-260), literal: an
    AND-style proximity queue of the leading minShouldMatch iterators
    (start asc, end desc) backed by a background queue (end asc, start
    desc); a popped proximity iterator advances into the background
    queue and is replaced by the background top."""

    def __init__(self, subs, m):
        self.m = m
        self.prox = _HeapPQ(lambda it: (it.start(), -it.end()))
        self.back = _HeapPQ(lambda it: (it.end(), -it.start()))
        for it in subs:                       # reset()
            if it.next_interval() != NO_MORE:
                self.back.add(it)
        self.queue_end = -1
        self._start = self._end = -1
        self._slop = 0
        for _ in range(m):
            it = self.back.pop()
            if it is None:
                break
            self.prox.add(it)
            self._update_right(it)

    def _update_right(self, it):
        if it.end() > self.queue_end:
            self.queue_end = it.end()

    def start(self):
        return self._start

    def end(self):
        return self._end

    def gaps(self):
        return self._slop

    def next_interval(self):
        prox, back, m = self.prox, self.back, self.m
        while len(prox) == m and prox.top().start() == self._start:
            it = prox.pop()
            if it.next_interval() != NO_MORE:
                back.add(it)
                nxt = back.pop()
                prox.add(nxt)
                self._update_right(nxt)
        if len(prox) < m:
            self._start = self._end = NO_MORE
            return NO_MORE
        while True:                           # do/while: minimize
            self._start = prox.top().start()
            self._end = self.queue_end
            slop = self._end - self._start + 1
            for it in prox:
                slop -= it.width()
            self._slop = slop
            if prox.top().end() == self._end:
                return self._start
            lead = prox.pop()
            if lead is not None:
                if lead.next_interval() != NO_MORE:
                    back.add(lead)
                nxt = back.pop()
                if nxt is not None:
                    prox.add(nxt)
                    self._update_right(nxt)
            if not (len(prox) == m and self._end == self.queue_end):
                return self._start


class _MsmIt(_It):
    def __init__(self, subs, m):
        super().__init__(_MsmStateIt(subs, m).drain())


def _filtering_drain(a: _It, b: _It, kind: str) -> list:
    """The FilteringIntervalIterator family (ContainedBy :46-66,
    Containing :46-66, Overlapping :42-60): b pre-advanced once at
    reset; gaps delegate to a."""
    out = []
    if b.next_interval() == NO_MORE:          # reset(): bpos
        return out
    bpos = True
    while bpos and a.next_interval() != NO_MORE:
        if kind == "contained_by":
            while b.end() < a.end():
                if b.next_interval() == NO_MORE:
                    bpos = False
                    break
            if bpos and b.start() <= a.start():
                out.append((a.start(), a.end(), a.gaps(), a.width()))
        elif kind == "containing":
            while b.start() < a.start() and b.end() < a.end():
                if b.next_interval() == NO_MORE:
                    bpos = False
                    break
            if bpos and a.start() <= b.start() and a.end() >= b.end():
                out.append((a.start(), a.end(), a.gaps(), a.width()))
        elif kind == "overlapping":
            while b.end() < a.start():
                if b.next_interval() == NO_MORE:
                    bpos = False
                    break
            if bpos and b.start() <= a.end():
                out.append((a.start(), a.end(), a.gaps(), a.width()))
        else:
            raise ValueError(kind)
    return out


def _difference_drain(a: _It, b: _It, kind: str, b_matches: bool) -> list:
    """DifferenceIntervalsSource iterators (NonOverlapping :64-81,
    NotContaining :70-86, NotContainedBy :70-85): b NOT pre-advanced
    (RelativeIterator.reset only checks the doc); when the subtrahend
    is absent on the doc, the minuend passes through."""
    out = []
    if not b_matches:
        while a.next_interval() != NO_MORE:
            out.append((a.start(), a.end(), a.gaps(), a.width()))
        return out
    bpos = True
    while a.next_interval() != NO_MORE:
        if not bpos:
            out.append((a.start(), a.end(), a.gaps(), a.width()))
            continue
        if kind == "non_overlapping":
            while b.end() < a.start():
                if b.next_interval() == NO_MORE:
                    bpos = False
                    break
            if not bpos or b.start() > a.end():
                out.append((a.start(), a.end(), a.gaps(), a.width()))
        elif kind == "not_containing":
            while b.start() < a.start() and b.end() < a.end():
                if b.next_interval() == NO_MORE:
                    bpos = False
                    break
            if not bpos or b.start() > a.end():
                out.append((a.start(), a.end(), a.gaps(), a.width()))
        elif kind == "not_contained_by":
            hit = False
            while b.end() < a.end():
                if b.next_interval() == NO_MORE:
                    # reference returns without clearing bpos; b is now
                    # exhausted so end()==NO_MORE and start()==NO_MORE,
                    # making every later a emit via a.start < b.start
                    hit = True
                    break
            if hit or a.start() < b.start():
                out.append((a.start(), a.end(), a.gaps(), a.width()))
        else:
            raise ValueError(kind)
    return out


# ---------------------------------------------------------------------------
# Tree evaluation


def eval_doc(src: Src, get_positions, field: str = "content") -> list:
    """Evaluate one document: returns the emitted interval list
    [(start, end, gaps, width)].  ``get_positions(field, term)`` returns
    the doc's sorted position array (possibly empty) for a term."""
    k = src.kind
    if k == "term":
        pos = get_positions(field, src.term)
        return [(int(p), int(p), 0, 1) for p in pos]
    if k == "nomatch":
        return []
    if k == "fixfield":
        return eval_doc(src.subs[0], get_positions, src.field)

    def sub_it(s: Src) -> _It:
        return _It(eval_doc(s, get_positions, field))

    if k == "ordered":
        subs = [sub_it(s) for s in src.subs]
        if any(len(s.iv) == 0 for s in subs):
            return []
        return _OrderedIt(subs).iv
    if k == "unordered":
        subs = [sub_it(s) for s in src.subs]
        if any(len(s.iv) == 0 for s in subs):
            return []
        return _UnorderedIt(subs).iv
    if k == "block":
        subs = [sub_it(s) for s in src.subs]
        if any(len(s.iv) == 0 for s in subs):
            return []
        return _BlockIt(subs).iv
    if k == "or":
        subs = [sub_it(s) for s in src.subs]
        subs = [s for s in subs if len(s.iv) > 0]
        if not subs:
            return []
        return _DisjunctionIt(subs).iv
    if k == "repeat":
        sub = sub_it(src.subs[0])
        if len(sub.iv) == 0:
            return []
        return _RepeatIt(sub, src.a).iv
    if k == "msm":
        subs = [sub_it(s) for s in src.subs]
        subs = [s for s in subs if len(s.iv) > 0]
        if len(subs) < src.a:
            return []
        return _MsmIt(subs, src.a).iv
    if k == "maxwidth":
        return [iv for iv in eval_doc(src.subs[0], get_positions, field)
                if iv[1] - iv[0] + 1 <= src.a]
    if k == "maxgaps":
        return [iv for iv in eval_doc(src.subs[0], get_positions, field)
                if iv[2] <= src.a]
    if k == "extend":
        out = []
        for s, e, g, _w in eval_doc(src.subs[0], get_positions, field):
            ns = max(0, s - src.a)
            ne = e + src.b
            if ne < 0 or ne >= NO_MORE:      # overflow clamp (:74-78)
                ne = NO_MORE - 1
            out.append((ns, ne, g, ne - ns + 1))
        return out
    if k == "offset":
        out = []
        for s, e, _g, _w in eval_doc(src.subs[0], get_positions, field):
            p = max(0, s - 1) if src.flag else min(e + 1, NO_MORE - 1)
            out.append((p, p, 0, 1))
        return out
    if k in ("contained_by", "containing", "overlapping"):
        order = {"contained_by": (0, 1), "containing": (0, 1),
                 "overlapping": (0, 1)}[k]
        a = _It(eval_doc(src.subs[order[0]], get_positions, field))
        b = _It(eval_doc(src.subs[order[1]], get_positions, field))
        if len(a.iv) == 0 or len(b.iv) == 0:
            return []                        # conjunction approximation
        return _filtering_drain(a, b, k)
    if k in ("non_overlapping", "not_containing", "not_contained_by"):
        a = _It(eval_doc(src.subs[0], get_positions, field))
        b = _It(eval_doc(src.subs[1], get_positions, field))
        if len(a.iv) == 0:
            return []
        return _difference_drain(a, b, k, b_matches=len(b.iv) > 0)
    raise ValueError(k)


def leaf_terms(src: Src, field: str = "content") -> list[tuple[str, str]]:
    """All (field, term) leaves of the tree."""
    if src.kind == "term":
        return [(field, src.term)]
    if src.kind == "fixfield":
        return leaf_terms(src.subs[0], src.field)
    out = []
    for s in src.subs:
        out.extend(leaf_terms(s, field))
    return out


def doc_approx_kind(src: Src) -> tuple[str, list[Src]]:
    """Doc-level approximation shape: ('and' | 'or' | 'first', subs) —
    how candidate doc sets combine (ConjunctionIntervalsSource = all
    subs match, Disjunction/MSM = any, Difference = minuend only,
    wrappers = pass-through)."""
    k = src.kind
    if k in ("ordered", "unordered", "block", "contained_by",
             "containing", "overlapping"):
        return "and", list(src.subs)
    if k in ("or", "msm"):
        return "or", list(src.subs)
    if k in ("non_overlapping", "not_containing", "not_contained_by"):
        return "first", [src.subs[0]]
    if k in ("maxwidth", "maxgaps", "extend", "offset", "repeat",
             "fixfield"):
        return "pass", [src.subs[0]]
    if k == "term":
        return "term", []
    if k == "nomatch":
        return "none", []
    raise ValueError(k)


# ---------------------------------------------------------------------------
# Multi-term sources (MultiTermIntervalsSource.java:39 — prefix/wildcard/
# regexp/fuzzyTerm/range factories Intervals.java:160-370): the automaton
# expands against the (segment) term dictionary, sorted order, at most
# max_expansions terms (IllegalStateException beyond, :69-74), then runs
# as a plain disjunction whose pullUpDisjunctions is a singleton.


def prefix(p: str, max_expansions: int = DEFAULT_MAX_EXPANSIONS) -> Src:
    return Src("multiterm", term=f"{p}*", a=max_expansions,
               subs=(("prefix", p),))


def wildcard(pat: str, max_expansions: int = DEFAULT_MAX_EXPANSIONS) -> Src:
    return Src("multiterm", term=pat, a=max_expansions,
               subs=(("wildcard", pat),))


def regexp(pat: str, max_expansions: int = DEFAULT_MAX_EXPANSIONS) -> Src:
    return Src("multiterm", term=pat, a=max_expansions,
               subs=(("regexp", pat),))


def fuzzy_term(t: str, max_edits: int = 2, prefix_length: int = 0,
               transpositions: bool = True,
               max_expansions: int = DEFAULT_MAX_EXPANSIONS) -> Src:
    return Src("multiterm", term=f"{t}~{max_edits}", a=max_expansions,
               subs=(("fuzzy", t, max_edits, prefix_length,
                      transpositions),))


def term_range(lower: str | None, upper: str | None, include_lower: bool,
               include_upper: bool,
               max_expansions: int = DEFAULT_MAX_EXPANSIONS) -> Src:
    disp = "{%s,%s}" % (lower if lower is not None else "*",
                        upper if upper is not None else "*")
    return Src("multiterm", term=disp, a=max_expansions,
               subs=(("range", lower, upper, include_lower,
                      include_upper),))


def _mt_matches(spec, t: str) -> bool:
    kind = spec[0]
    if kind == "prefix":
        return t.startswith(spec[1])
    if kind == "wildcard":
        import re as _re
        pat = "".join(
            "." if c == "?" else ".*" if c == "*" else _re.escape(c)
            for c in spec[1])
        return _re.fullmatch(pat, t) is not None
    if kind == "regexp":
        import re as _re
        return _re.fullmatch(spec[1], t) is not None
    if kind == "fuzzy":
        _, q, max_edits, plen, transp = spec
        if t == q:
            return True
        if t[:plen] != q[:plen]:
            return False
        from .search import _edit_distance, _osa_distance
        d = (_osa_distance if transp else _edit_distance)(q, t, max_edits)
        return d <= max_edits
    if kind == "range":
        _, lo, hi, inc_lo, inc_hi = spec
        if lo is not None and (t < lo or (t == lo and not inc_lo)):
            return False
        if hi is not None and (t > hi or (t == hi and not inc_hi)):
            return False
        return True
    raise ValueError(kind)


def expand_multiterms(src: Src, vocab) -> Src:
    """Replace multiterm nodes by their sorted-dictionary expansions
    (MultiTermIntervalsSource.intervals :58-80); ``vocab`` is the sorted
    term list of the segment/index. Raises RuntimeError beyond
    max_expansions with the reference's message shape."""
    if src.kind == "multiterm":
        spec = src.subs[0]
        out = []
        for t in vocab:
            if _mt_matches(spec, t):
                out.append(term(t))
                if len(out) > src.a:
                    raise RuntimeError(
                        f"Automaton [{src.term}] expanded to too many "
                        f"terms (limit {src.a})")
        if not out:
            return no_intervals(f"no terms for {src.term}")
        if len(out) == 1:
            return out[0]
        return Src("or", tuple(out), flag=False)
    if not src.subs or src.kind == "term":
        return src
    new_subs = tuple(
        expand_multiterms(s, vocab) if isinstance(s, Src) else s
        for s in src.subs)
    if new_subs == src.subs:
        return src
    return Src(src.kind, new_subs, term=src.term, a=src.a, b=src.b,
               flag=src.flag, field=src.field, name=src.name)
