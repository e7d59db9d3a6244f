"""UCT join-attribute-order learning — ADOPT's namesake adaptive
mechanism, recast for a distributed DataFrame engine.

Reference parity (jxiw/ADOPT):
  * UCB1 action selection with untried-actions-first priority queue and
    random tie offset — joining/uct/ParallelUctNodeLFTJ.java:213-298
    (selectAction).
  * One-node-per-episode tree expansion and recursive sampling —
    ParallelUctNodeLFTJ.java:404-432 (sample, canExpand = createdIn !=
    roundCtr).
  * Random playout completion below the tree frontier —
    ParallelUctNodeLFTJ.java:319-368 (playout).
  * Avoid-Cartesian heuristic: actions restricted to attributes
    connected by some join predicate to the already-bound set —
    query/QueryInfo.java:698-714 (connectedAttribute), mirrored here in
    ``_UctNode.recommended``.
  * Mean-reward optimal-order extraction —
    ParallelUctNodeLFTJ.java (getOptimalOrder).
  * Exploration weight default 1e-6 (near-greedy once every action has
    one try) — config/JoinConfig.java:12-31.

Episodes without suspend/resume
-------------------------------
The reference interleaves episodes inside ONE shared LFTJ scan: each
episode advances a tuple budget (10k steps) under its chosen attribute
order, suspends, and the next episode resumes elsewhere.  A distributed
engine cannot suspend a shuffle mid-flight, so we partition the WORK
instead of the clock: one join variable (``slice_var``) is
hash-partitioned into ``n_slices`` disjoint slices, and an episode
evaluates the full conjunctive motif query restricted to one slice
under a UCT-chosen variable order.  The slice restriction is pushed
into EVERY atom occurrence of the slice variable, so a good order keeps
every intermediate ~1/n_slices of the global one.  A per-level
cardinality budget (``cap``) plays the role of the reference's step
budget: an episode whose intermediate blows the cap aborts with reward
0 (budget exhausted) and its slice is re-queued; the budget probe is a
``limit(cap+1).count()`` so an aborted level pays at most cap+1 rows
per task (LocalLimit short-circuits), not the full blow-up.

Correctness is order-independent by construction: each slice is
counted by exactly one COMPLETED episode, and a completed episode
computes the exact query result restricted to its slice (all atoms
joined, whatever the order).  Sum of slices = exact motif count.  The
canonical order with no cap is the always-terminates fallback, so the
result never depends on what the learner happened to learn.

Scale shape (100 TB): learner state is driver-side and tiny (≤
episodes × n_vars nodes); every episode is an ordinary distributed
equi-join pipeline over ~1/n_slices of the edges — narrow (long,long)
rows, no Python in the loop; the exploit phase runs only the learned
order, so steady-state cost is the best plan found, not the average.
Reward = 1 / (1 + intermediate_rows / expected_slice_edges), the
work-normalized inverse of the wire volume the order caused — the same
progress-per-work currency the reference's episode reward uses.
"""

from __future__ import annotations

import math
import random
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass(frozen=True)
class Atom:
    """One edge-relation occurrence ``edge(v_sv, v_tv)``.

    ``lt`` adds the reference suite's per-alias ``sid < tid`` filter
    (graph_query/{3..7}_clique.sql orient every alias; the cycle files
    orient the chain and, for n>=6, the closing alias).
    """
    sv: int
    tv: int
    lt: bool = True

    def vars(self) -> tuple[int, int]:
        return (self.sv, self.tv)


@dataclass(frozen=True)
class MotifQuery:
    """``var_upper`` holds (var, upper_bound) pairs — the
    graph_selectivity_query encoding's per-variable ``< K`` predicates,
    replicated onto every atom occurrence of the variable so they push
    into every scan (motifs._directed_sql does the same on the SQL
    side)."""
    n_vars: int
    atoms: tuple[Atom, ...]
    var_upper: tuple[tuple[int, int], ...] = ()

    def connects(self, v: int, bound: frozenset[int]) -> bool:
        for a in self.atoms:
            if (a.sv == v and a.tv in bound) or (a.tv == v and a.sv in bound):
                return True
        return False


def clique_query(n: int) -> MotifQuery:
    """Same semantics as motifs.clique_sql(n): every pair an lt-alias."""
    from itertools import combinations
    return MotifQuery(n, tuple(Atom(i, j, lt=True)
                               for i, j in combinations(range(1, n + 1), 2)))


def cycle_query(n: int) -> MotifQuery:
    """Same semantics as motifs.cycle_sql(n), closing-alias conventions
    included (raw (vn,v1) for n=4, raw (v1,vn) for n=5, lt (v1,vn) for
    n>=6)."""
    if n == 3:
        return clique_query(3)
    atoms = [Atom(i, i + 1, lt=True) for i in range(1, n)]
    if n == 4:
        atoms.append(Atom(n, 1, lt=False))
    elif n == 5:
        atoms.append(Atom(1, n, lt=False))
    else:
        atoms.append(Atom(1, n, lt=True))
    return MotifQuery(n, tuple(atoms))


def pattern_query(atoms: list[tuple[int, int, bool]],
                  bounds: dict[int, int] | None = None) -> MotifQuery:
    """Arbitrary connected edge pattern → MotifQuery for the UCT
    executor — the learner and the sliced-episode evaluator are already
    pattern-generic (they only read atoms/var_upper), this is the
    public constructor. Same (sv, tv, lt) encoding and validation as
    motifs.pattern_sql, so the generated SQL is the exact oracle of the
    UCT-executed count."""
    from adopt_spark.algos.motifs import _validate_pattern
    n = _validate_pattern(atoms)
    return MotifQuery(n, tuple(Atom(sv, tv, lt) for sv, tv, lt in atoms),
                      tuple(sorted((bounds or {}).items())))


def selectivity_clique_uct(n: int, bounds: dict[int, int]) -> MotifQuery:
    """Same semantics as motifs.selectivity_clique_sql(n, bounds):
    DIRECTED motif (no lt filters), chain + lexicographic chords,
    per-variable upper bounds."""
    from itertools import combinations
    chain = [(i, i + 1) for i in range(1, n)]
    chords = sorted(p for p in combinations(range(1, n + 1), 2)
                    if p not in set(chain))
    return MotifQuery(n, tuple(Atom(i, j, lt=False) for i, j in chain + chords),
                      tuple(sorted(bounds.items())))


def selectivity_cycle_uct(n: int, bounds: dict[int, int]) -> MotifQuery:
    """Same semantics as motifs.selectivity_cycle_sql(n, bounds)."""
    pairs = [(i, i + 1) for i in range(1, n)] + [(1, n)]
    return MotifQuery(n, tuple(Atom(i, j, lt=False) for i, j in pairs),
                      tuple(sorted(bounds.items())))


@dataclass
class EpisodeResult:
    completed: bool
    count: int = 0
    work: int = 0
    reward: float = 0.0
    order: tuple[int, ...] = ()
    aborted_level: int = -1


def _run_order(edges: DataFrame, query: MotifQuery, order: list[int],
               slice_var: int, n_slices: int, slice_id: int,
               cap: int | None, denom: float) -> EpisodeResult:
    """Evaluate the motif restricted to one slice under one variable order.

    Per level: bind the next variable via the first connecting atom
    (expansion join), apply every other connecting atom as a left-semi
    filter, then budget-probe the intermediate. Returns exact slice
    count on completion.
    """
    upper = dict(query.var_upper)

    def atom_df(a: Atom) -> DataFrame:
        d = edges
        if a.lt:
            d = d.where(F.col("sid") < F.col("tid"))
        if a.sv in upper:
            d = d.where(F.col("sid") < F.lit(upper[a.sv]))
        if a.tv in upper:
            d = d.where(F.col("tid") < F.lit(upper[a.tv]))
        if a.sv == slice_var:
            d = d.where(F.pmod(F.xxhash64("sid"), F.lit(n_slices))
                        == F.lit(slice_id))
        if a.tv == slice_var:
            d = d.where(F.pmod(F.xxhash64("tid"), F.lit(n_slices))
                        == F.lit(slice_id))
        return d.select(F.col("sid").alias(f"v{a.sv}"),
                        F.col("tid").alias(f"v{a.tv}"))

    pending: list[Atom] = list(query.atoms)
    bound: set[int] = set()
    P: DataFrame | None = None
    persisted: list[DataFrame] = []
    work = 0
    try:
        for level, w in enumerate(order):
            connecting = [a for a in pending
                          if (a.sv == w and a.tv in bound)
                          or (a.tv == w and a.sv in bound)]
            if P is None:
                inc = next(a for a in pending if w in a.vars())
                P = atom_df(inc).select(f"v{w}").distinct()
            elif connecting:
                first, *rest = connecting
                on_col = f"v{first.tv if first.sv == w else first.sv}"
                P = P.join(atom_df(first), on=on_col)
                for a in rest:
                    P = P.join(atom_df(a), on=[f"v{a.sv}", f"v{a.tv}"],
                               how="left_semi")
                for a in connecting:
                    pending.remove(a)
            else:
                # Cartesian step — reachable only through playouts that
                # the avoid-Cartesian restriction could not prevent
                # (never for connected motifs); kept for generality.
                inc = next(a for a in pending if w in a.vars())
                P = P.crossJoin(atom_df(inc).select(f"v{w}").distinct())
            bound.add(w)
            P = P.persist()
            persisted.append(P)
            if cap is not None:
                cnt = P.limit(cap + 1).count()
                if cnt > cap:
                    return EpisodeResult(False, work=work, order=tuple(order),
                                         aborted_level=level)
            else:
                cnt = P.count()
            work += cnt
        assert not pending, f"unconsumed atoms {pending} for order {order}"
        final = int(P.count()) if P is not None else 0
        reward = 1.0 / (1.0 + work / max(1.0, denom))
        return EpisodeResult(True, count=final, work=work, reward=reward,
                             order=tuple(order))
    finally:
        for d in persisted:
            d.unpersist()


class _UctNode:
    """UCT tree node over partial variable orders (reference:
    ParallelUctNodeLFTJ, single-stats-bank variant — episodes here are
    sequential driver-side, each one a distributed job)."""

    def __init__(self, round_ctr: int, query: MotifQuery,
                 joined: frozenset[int], rng: random.Random,
                 explore_w: float):
        self.created_in = round_ctr
        self.query = query
        self.joined = joined
        self.rng = rng
        self.explore_w = explore_w
        unjoined = [v for v in range(1, query.n_vars + 1) if v not in joined]
        self.actions = unjoined
        if joined:
            rec = [v for v in unjoined if query.connects(v, joined)]
        else:
            rec = list(unjoined)
        self.recommended = rec or list(unjoined)
        self.priority = list(self.recommended)
        rng.shuffle(self.priority)
        self.children: dict[int, _UctNode] = {}
        self.tries: dict[int, int] = {v: 0 for v in unjoined}
        self.acc: dict[int, float] = {v: 0.0 for v in unjoined}
        self.visits = 0

    def _select(self) -> int:
        if self.priority:
            return self.priority.pop(0)
        offset = self.rng.randrange(len(self.recommended))
        best, best_q = self.recommended[0], -1.0
        for k in range(len(self.recommended)):
            v = self.recommended[(offset + k) % len(self.recommended)]
            if self.tries[v] < 1:
                continue
            mean = self.acc[v] / self.tries[v]
            q = mean + self.explore_w * math.sqrt(
                math.log(max(1, self.visits)) / self.tries[v])
            if q > best_q:
                best, best_q = v, q
        return best

    def sample(self, round_ctr: int, order: list[int], execute) -> float:
        if not self.actions:
            return execute(order)
        v = self._select()
        order.append(v)
        can_expand = self.created_in != round_ctr
        if v not in self.children and can_expand:
            self.children[v] = _UctNode(round_ctr, self.query,
                                        self.joined | {v}, self.rng,
                                        self.explore_w)
        child = self.children.get(v)
        if child is not None and len(order) < self.query.n_vars:
            reward = child.sample(round_ctr, order, execute)
        else:
            reward = self._playout(order, execute)
        self.visits += 1
        self.tries[v] += 1
        self.acc[v] += reward
        return reward

    def _playout(self, order: list[int], execute) -> float:
        joined = set(order)
        while len(order) < self.query.n_vars:
            un = [v for v in range(1, self.query.n_vars + 1)
                  if v not in joined]
            conn = [v for v in un if self.query.connects(v, frozenset(joined))]
            v = self.rng.choice(conn or un)
            order.append(v)
            joined.add(v)
        return execute(order)

    def optimal_order(self) -> list[int]:
        order: list[int] = []
        node: _UctNode | None = self
        joined: set[int] = set()
        while node is not None and node.actions:
            tried = [(node.acc[v] / node.tries[v], v)
                     for v in node.recommended if node.tries[v] > 0]
            if not tried:
                break
            _, best = max(tried)
            order.append(best)
            joined.add(best)
            node = node.children.get(best)
        # canonical connected-first completion for the unvisited suffix
        while len(order) < self.query.n_vars:
            un = [v for v in range(1, self.query.n_vars + 1)
                  if v not in joined]
            conn = [v for v in un
                    if self.query.connects(v, frozenset(joined))] or un
            order.append(conn[0])
            joined.add(conn[0])
        return order


@dataclass
class UctRunInfo:
    episodes: list[EpisodeResult] = field(default_factory=list)
    optimal_order: tuple[int, ...] = ()
    fallback_slices: int = 0
    explored_slices: int = 0


def uct_motif_count(spark: SparkSession, edges: DataFrame,
                    query: MotifQuery, slice_var: int = 1,
                    n_slices: int = 16, explore_frac: float = 0.5,
                    cap_factor: float = 8.0, max_attempts: int = 3,
                    exploration_weight: float = 1e-6,
                    seed: int = 7) -> tuple[int, UctRunInfo]:
    """Exact motif count with the variable order learned at runtime.

    Explore phase: the first ceil(explore_frac * n_slices) slices run
    UCT-sampled orders (episodes), mirroring the reference's sampling
    thread.  Exploit phase: remaining slices run getOptimalOrder's
    order (the reference's exploit threads).  A slice whose episodes
    all blow the budget falls back to the canonical order uncapped, so
    termination and exactness never depend on the learner.
    """
    edges = edges.persist()
    try:
        n_edges = edges.count()
        denom = max(1.0, n_edges / n_slices)
        cap = int(cap_factor * denom) + 64
        rng = random.Random(seed)
        root = _UctNode(0, query, frozenset(), rng, exploration_weight)
        info = UctRunInfo()
        canonical = list(range(1, query.n_vars + 1))
        total = 0
        round_ctr = 0
        explore_n = max(1, math.ceil(explore_frac * n_slices))
        info.explored_slices = min(explore_n, n_slices)

        def run(order: list[int], slice_id: int,
                level_cap: int | None) -> EpisodeResult:
            return _run_order(edges, query, order, slice_var, n_slices,
                              slice_id, level_cap, denom)

        for s in range(n_slices):
            res: EpisodeResult | None = None
            if s < explore_n:
                for _ in range(max_attempts):
                    round_ctr += 1
                    cell: dict[str, EpisodeResult] = {}

                    def execute(order: list[int]) -> float:
                        r = run(order, s, cap)
                        cell["res"] = r
                        return r.reward

                    order: list[int] = []
                    root.sample(round_ctr, order, execute)
                    res = cell["res"]
                    info.episodes.append(res)
                    if res.completed:
                        break
            else:
                order = root.optimal_order()
                res = run(order, s, cap * 4)
                info.episodes.append(res)
            if res is None or not res.completed:
                res = run(canonical, s, None)
                info.episodes.append(res)
                info.fallback_slices += 1
            total += res.count
        info.optimal_order = tuple(root.optimal_order())
        return total, info
    finally:
        edges.unpersist()
