"""Pure-Python stand-in for the ``python-igraph`` API subset used by the
reference planner's ``GraphBase`` wrapper
(/root/reference/graph_ltpl/data_objects/GraphBase.py — the reference
confines ALL igraph contact to that class, see its docstring :13-25).

Purpose: the sandbox has no network and no installed ``python-igraph``, so
the reference code cannot run as-is.  This shim implements the exact API
surface GraphBase touches (directed graph, named vertices with arbitrary
attributes, edge attributes, ``vs.find/select``, ``induced_subgraph``,
``get_shortest_paths`` Dijkstra, ``get_eid(s)``, ``delete_edges``,
``successors``/``predecessors``, ``copy``) so the REFERENCE code itself can
be executed end-to-end as the golden for the parity harness
(parity/run_reference.py).  It is used only by the parity tooling — the TPU
framework never imports it.

Deviations from real igraph (documented, none observable by GraphBase):
  * "edge ids" are the Edge objects themselves (GraphBase only ever passes
    ids straight back into ``es[...]`` / ``delete_edges`` / ``es(...)``,
    never does arithmetic on them; the one sentinel comparison ``== -1``
    from ``get_eid(..., error=False)`` is preserved).
  * ``es`` iteration order after ``delete_edges`` is insertion order of the
    survivors, not igraph's compacted renumbering (order-insensitive in all
    GraphBase uses: collision scans and cost writes are per-edge).
  * Dijkstra ties broken by heap insertion order (deterministic); edge
    costs on the shipped tracks are continuous floats, so exact ties do
    not occur in practice.
"""

import heapq
import itertools


class Vertex:
    __slots__ = ("index", "attrs", "graph")

    def __init__(self, index, attrs, graph):
        self.index = index
        self.attrs = attrs
        self.graph = graph

    def __getitem__(self, key):
        return self.attrs.get(key)

    def __setitem__(self, key, value):
        self.attrs[key] = value


class Edge:
    __slots__ = ("source", "target", "attrs", "deleted")

    def __init__(self, source, target, attrs):
        self.source = source
        self.target = target
        self.attrs = attrs
        self.deleted = False

    def __getitem__(self, key):
        return self.attrs.get(key)

    def __setitem__(self, key, value):
        self.attrs[key] = value


class VertexSeq:
    def __init__(self, graph, vertices=None):
        self._graph = graph
        self._vertices = vertices  # None = all

    def _all(self):
        return self._graph._vertices if self._vertices is None else self._vertices

    def __iter__(self):
        return iter(self._all())

    def __len__(self):
        return len(self._all())

    def __getitem__(self, key):
        if isinstance(key, str):
            return [v.attrs.get(key) for v in self._all()]
        return self._all()[key]

    def find(self, name):
        v = self._graph._name_index.get(name)
        if v is None:
            raise ValueError(f"no such vertex: {name!r}")
        return v

    def select(self, **conds):
        out = []
        for v in self._all():
            ok = True
            for key, val in conds.items():
                if key.endswith("_ge"):
                    ok = v.attrs.get(key[:-3]) >= val
                elif key.endswith("_le"):
                    ok = v.attrs.get(key[:-3]) <= val
                elif key.endswith("_gt"):
                    ok = v.attrs.get(key[:-3]) > val
                elif key.endswith("_lt"):
                    ok = v.attrs.get(key[:-3]) < val
                elif key.endswith("_notin"):
                    ok = v.attrs.get(key[:-6]) not in val
                elif key.endswith("_in"):
                    ok = v.attrs.get(key[:-3]) in val
                elif key.endswith("_eq"):
                    ok = v.attrs.get(key[:-3]) == val
                else:
                    ok = v.attrs.get(key) == val
                if not ok:
                    break
            if ok:
                out.append(v)
        return VertexSeq(self._graph, out)


class EdgeSeq:
    def __init__(self, graph, edges=None):
        self._graph = graph
        self._edges = edges  # None = all live edges

    def _all(self):
        if self._edges is not None:
            return self._edges
        return [e for e in self._graph._edges if not e.deleted]

    def __iter__(self):
        return iter(self._all())

    def __len__(self):
        return len(self._all())

    def __getitem__(self, key):
        if isinstance(key, Edge):
            return key
        if isinstance(key, str):
            return [e.attrs.get(key) for e in self._all()]
        return self._all()[key]

    def __call__(self, key):
        """es(edge_id) -> single-element EdgeSeq (attribute access returns
        a list, matching igraph: ``es(eid)['attr'][0]``)."""
        if isinstance(key, Edge):
            return EdgeSeq(self._graph, [key])
        return EdgeSeq(self._graph, [self._all()[key]])


class Graph:
    def __init__(self):
        self._vertices = []            # list[Vertex], index == position
        self._name_index = {}          # name -> Vertex
        self._edges = []               # list[Edge] (may contain tombstones)
        self._eid = {}                 # (src_idx, dst_idx) -> Edge
        self._out = {}                 # src_idx -> list[Edge]
        self._in = {}                  # dst_idx -> list[Edge]

    # -- structure ---------------------------------------------------------
    def to_directed(self):
        return None

    def add_vertex(self, name=None, **attrs):
        attrs = dict(attrs)
        if name is not None:
            attrs["name"] = name
        v = Vertex(len(self._vertices), attrs, self)
        self._vertices.append(v)
        if name is not None:
            self._name_index[name] = v
        return v

    def _resolve_vertex(self, ref):
        if isinstance(ref, Vertex):
            return ref
        if isinstance(ref, str):
            v = self._name_index.get(ref)
            if v is None:
                raise ValueError(f"no such vertex: {ref!r}")
            return v
        return self._vertices[ref]

    def add_edge(self, source=None, target=None, **attrs):
        sv = self._resolve_vertex(source)
        tv = self._resolve_vertex(target)
        e = Edge(sv.index, tv.index, dict(attrs))
        self._edges.append(e)
        self._eid[(sv.index, tv.index)] = e
        self._out.setdefault(sv.index, []).append(e)
        self._in.setdefault(tv.index, []).append(e)
        return e

    def get_eid(self, v1, v2, error=True):
        try:
            sv = self._resolve_vertex(v1)
            tv = self._resolve_vertex(v2)
        except (ValueError, IndexError):
            if error:
                raise ValueError(f"no such vertex pair ({v1!r}, {v2!r})")
            return -1
        e = self._eid.get((sv.index, tv.index))
        if e is None or e.deleted:
            if error:
                raise ValueError(f"no such edge ({v1!r}, {v2!r})")
            return -1
        return e

    def get_eids(self, pairs):
        return [self.get_eid(a, b) for a, b in pairs]

    def delete_edges(self, ids):
        if isinstance(ids, Edge):
            ids = [ids]
        n_del = 0
        for e in ids:
            # ids may come from another graph instance (igraph int ids stay
            # valid across .copy(); GraphBase.init_edge_filter:773-775 relies
            # on that) — resolve by endpoint pair, which copy() preserves
            if self._eid.get((e.source, e.target)) is not e:
                e = self._eid.get((e.source, e.target))
                if e is None:
                    continue
            if e.deleted:
                continue
            e.deleted = True
            n_del += 1
            del self._eid[(e.source, e.target)]
            self._out[e.source].remove(e)
            self._in[e.target].remove(e)
        # amortized tombstone compaction (O(1) per single-edge delete, the
        # hot case in the reference's gen_edges pass 2 removal loop)
        self._tombstones = getattr(self, "_tombstones", 0) + n_del
        if self._tombstones > max(1024, len(self._edges) // 4):
            self._edges = [e for e in self._edges if not e.deleted]
            self._tombstones = 0

    # -- attribute sequences -------------------------------------------------
    @property
    def vs(self):
        return VertexSeq(self)

    @property
    def es(self):
        return EdgeSeq(self)

    # -- neighborhood --------------------------------------------------------
    def successors(self, index):
        if isinstance(index, Vertex):
            index = index.index
        return [e.target for e in self._out.get(index, ())]

    def predecessors(self, index):
        if isinstance(index, Vertex):
            index = index.index
        return [e.source for e in self._in.get(index, ())]

    def vcount(self):
        return len(self._vertices)

    def ecount(self):
        return len(self._edges)

    # -- copies / subgraphs ----------------------------------------------------
    def copy(self):
        g = Graph()
        for v in self._vertices:
            g.add_vertex(**dict(v.attrs))
        for e in self._edges:
            if not e.deleted:
                g.add_edge(source=e.source, target=e.target, **dict(e.attrs))
        return g

    def induced_subgraph(self, vertices):
        g = Graph()
        remap = {}
        for v in vertices:
            if not isinstance(v, Vertex):
                v = self._vertices[v]
            remap[v.index] = len(g._vertices)
            g.add_vertex(**dict(v.attrs))
        for e in self._edges:
            if e.deleted:
                continue
            si = remap.get(e.source)
            ti = remap.get(e.target)
            if si is not None and ti is not None:
                g.add_edge(source=si, target=ti, **dict(e.attrs))
        return g

    # -- search ---------------------------------------------------------------
    def get_shortest_paths(self, v, to=None, weights=None, output="vpath",
                           mode="out"):
        """Single-source Dijkstra to a single target (the only form
        GraphBase uses: GraphBase.py:818-821).  Returns ``[[v, ..., to]]``
        or ``[[]]`` when unreachable, matching igraph."""
        assert output == "vpath"
        src = self._resolve_vertex(v).index
        dst = self._resolve_vertex(to).index
        dist = {src: 0.0}
        prev = {}
        counter = itertools.count()
        pq = [(0.0, next(counter), src)]
        found = src == dst
        while pq:
            d, _, n = heapq.heappop(pq)
            if n == dst:
                found = True
                break
            if d > dist.get(n, float("inf")):
                continue
            for e in self._out.get(n, ()):
                w = e.attrs.get(weights) if weights else 1.0
                nd = d + w
                m = e.target
                if nd < dist.get(m, float("inf")):
                    dist[m] = nd
                    prev[m] = n
                    heapq.heappush(pq, (nd, next(counter), m))
        if not found:
            return [[]]
        path = [dst]
        while path[-1] != src:
            path.append(prev[path[-1]])
        return [path[::-1]]
