"""HCQR — hierarchical cell query result.

Re-creation of the reference's HCQRSpatialGrid tree (include/hic/
HtmCqr.h:26-33,43-50; ops src/HcqrOpTree.cpp:70-141): a pruned tree
over grid pixels where a node is either FULL-MATCH (its whole subtree
matches), PARTIAL (leaf with its own item list), or INTERNAL (has
children).  Supports ``+ / -`` and ``allToFull``; ``^`` is unsupported
exactly as in the reference (src/HcqrOpTree.cpp:136-137).

``compactified(min_level)`` merges a node's full-match children into a
full-match parent when they cover every child slot, stopping above
``min_level`` (src/static-htm-index.cpp:359-361, apps/mainc.cpp:232-238).

Invariant: flatten(HCQR op) == flatten(CQR op) for the same operands —
the engine's analogue of the reference's cross-engine debugDiff
(apps/mainq.cpp:399-482); enforced by tests/test_hcqr.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..grids.base import Grid
from .cqr import CQR


@dataclass
class HNode:
    fm: bool = False
    items: np.ndarray | None = None  # leaf partial-match list
    children: dict = field(default_factory=dict)  # child pixel -> HNode

    def is_leaf_pm(self) -> bool:
        return self.items is not None


class HCQR:
    def __init__(self, grid: Grid, level: int, postings, leaf_pixels: np.ndarray):
        """postings: pixel -> sorted docs; leaf_pixels: all POPULATED
        leaf pixels (needed to expand internal full-match nodes)."""
        self.grid = grid
        self.level = level
        self.postings = postings
        self.leaf_pixels = np.asarray(leaf_pixels, dtype=np.int64)
        self.roots: dict[int, HNode] = {}
        self._anc_cache: dict[int, np.ndarray] = {}

    # -- construction ----------------------------------------------------
    @classmethod
    def from_cqr(cls, cqr: CQR, grid: Grid, level: int, leaf_pixels: np.ndarray) -> "HCQR":
        h = cls(grid, level, cqr.postings, leaf_pixels)
        for i, pix in enumerate(cqr.pixels):
            path = h._path(int(pix))
            node_map = h.roots
            node = None
            for p in path:
                node = node_map.setdefault(p, HNode())
                node_map = node.children
            if cqr.fm[i]:
                node.fm = True
                node.children = {}
            else:
                node.items = cqr.items[i]
        return h

    def _path(self, pix: int) -> list[int]:
        """Ancestor chain root..leaf of a leaf pixel (int64-view ids)."""
        chain = [pix]
        cur = np.array([pix], dtype=np.int64)
        lvl = int(self.grid.level(cur.view(np.uint64))[0])
        for _ in range(lvl):
            cur = self.grid.parent(cur.view(np.uint64)).view(np.int64)
            chain.append(int(cur[0]))
        return chain[::-1]

    def _ancestors_at(self, lvl: int) -> np.ndarray:
        """Ancestor (at level lvl) of every populated leaf pixel."""
        if lvl not in self._anc_cache:
            steps = self.level - lvl
            anc = self.grid.parent(self.leaf_pixels.view(np.uint64), steps=steps).view(np.int64)
            self._anc_cache[lvl] = anc
        return self._anc_cache[lvl]

    def _leaves_under(self, pix: int, lvl: int) -> np.ndarray:
        if lvl == self.level:
            return np.array([pix], dtype=np.int64)
        anc = self._ancestors_at(lvl)
        return self.leaf_pixels[anc == pix]

    def _subtree_docs(self, pix: int, lvl: int) -> np.ndarray:
        leaves = self._leaves_under(pix, lvl)
        if not len(leaves):
            return np.empty(0, np.int64)
        if hasattr(self.postings, "many"):  # bulk gather (backend path)
            return np.unique(self.postings.many(leaves))
        return np.unique(np.concatenate([self.postings(int(p)) for p in leaves]))

    def _clone_empty(self) -> "HCQR":
        h = HCQR(self.grid, self.level, self.postings, self.leaf_pixels)
        h._anc_cache = self._anc_cache  # share
        return h

    # -- stats (apps/mainq.cpp:151-156 analogues) ------------------------
    def number_of_nodes(self) -> int:
        def cnt(n: HNode) -> int:
            return 1 + sum(cnt(c) for c in n.children.values())

        return sum(cnt(n) for n in self.roots.values())

    def depth(self) -> int:
        def d(n: HNode) -> int:
            return 1 + max((d(c) for c in n.children.values()), default=0)

        return max((d(n) for n in self.roots.values()), default=0)

    # -- compactify ------------------------------------------------------
    def compactified(self, min_level: int = 0) -> "HCQR":
        out = self._clone_empty()

        def walk(pix: int, lvl: int, node: HNode) -> HNode:
            new = HNode(fm=node.fm, items=node.items)
            if node.children:
                new.children = {
                    cp: walk(cp, lvl + 1, cn) for cp, cn in node.children.items()
                }
                if (
                    lvl >= min_level
                    and len(new.children) == self.grid.children_count(pix)
                    and all(c.fm for c in new.children.values())
                ):
                    return HNode(fm=True)
            return new

        out.roots = {p: walk(p, 0, n) for p, n in self.roots.items()}
        return out

    # -- set ops ---------------------------------------------------------
    def union(self, other: "HCQR") -> "HCQR":
        out = self._clone_empty()

        def u(a: HNode | None, b: HNode | None) -> HNode:
            if a is None:
                return b
            if b is None:
                return a
            if a.fm or b.fm:
                return HNode(fm=True)
            if a.is_leaf_pm() or b.is_leaf_pm():
                # leaf-PM vs internal at the same pixel cannot occur with
                # single-leaf-level construction (items live only at leaf
                # pixels); assert rather than silently dropping the items
                assert a.is_leaf_pm() and b.is_leaf_pm(), (
                    "HCQR.union: leaf-PM node met an internal node at the "
                    "same pixel — mixed-level trees are not supported"
                )
                return HNode(items=np.union1d(a.items, b.items))
            new = HNode()
            for k in set(a.children) | set(b.children):
                new.children[k] = u(a.children.get(k), b.children.get(k))
            return new

        out.roots = {
            k: u(self.roots.get(k), other.roots.get(k))
            for k in set(self.roots) | set(other.roots)
        }
        return out

    def intersect(self, other: "HCQR") -> "HCQR":
        out = self._clone_empty()

        def i(a: HNode | None, b: HNode | None) -> HNode | None:
            if a is None or b is None:
                return None
            if a.fm:
                return _copy(b)
            if b.fm:
                return _copy(a)
            if a.is_leaf_pm() and b.is_leaf_pm():
                d = np.intersect1d(a.items, b.items)
                return HNode(items=d) if len(d) else None
            new = HNode()
            for k in set(a.children) & set(b.children):
                c = i(a.children.get(k), b.children.get(k))
                if c is not None:
                    new.children[k] = c
            return new if new.children else None

        out.roots = {}
        for k in set(self.roots) & set(other.roots):
            n = i(self.roots[k], other.roots[k])
            if n is not None:
                out.roots[k] = n
        return out

    def difference(self, other: "HCQR") -> "HCQR":
        out = self._clone_empty()

        def d(pix: int, lvl: int, a: HNode | None, b: HNode | None) -> HNode | None:
            if a is None:
                return None
            if b is None:
                return _copy(a)
            if b.fm:
                return None
            if a.fm:
                # expand a into concrete docs below this pixel
                a = self._materialize(pix, lvl)
            if a.is_leaf_pm() and b.is_leaf_pm():
                r = np.setdiff1d(a.items, b.items, assume_unique=True)
                return HNode(items=r) if len(r) else None
            if a.is_leaf_pm():
                # b internal at same pixel: impossible below leaf level
                return _copy(a)
            new = HNode()
            for k, av in a.children.items():
                c = d(k, lvl + 1, av, b.children.get(k))
                if c is not None:
                    new.children[k] = c
            return new if new.children else None

        out.roots = {}
        for k, av in self.roots.items():
            n = d(k, 0, av, other.roots.get(k))
            if n is not None:
                out.roots[k] = n
        return out

    def _materialize(self, pix: int, lvl: int) -> HNode:
        """fm node → explicit subtree of leaf pm nodes (ItemIndexStore
        expansion analogue)."""
        node = HNode()
        for leaf in self._leaves_under(pix, lvl):
            chain = self._path(int(leaf))[lvl + 1:]
            cur = node
            for p in chain:
                cur = cur.children.setdefault(p, HNode())
            cur.items = self.postings(int(leaf))
        return node

    def sym_diff(self, other: "HCQR") -> "HCQR":
        raise NotImplementedError(
            "HCQR '^' is unsupported, matching the reference (src/HcqrOpTree.cpp:136-137)"
        )

    def all_to_full(self) -> "HCQR":
        out = self._clone_empty()

        def f(n: HNode) -> HNode:
            if n.fm or n.is_leaf_pm():
                return HNode(fm=True)
            return HNode(children={k: f(c) for k, c in n.children.items()})

        out.roots = {k: f(n) for k, n in self.roots.items()}
        return out

    def apply(self, op: str, other: "HCQR") -> "HCQR":
        if op == "+":
            return self.union(other)
        if op in (" ", "/"):
            return self.intersect(other)
        if op == "-":
            return self.difference(other)
        return self.sym_diff(other)

    # -- flatten ---------------------------------------------------------
    def items(self) -> np.ndarray:
        """Flattened doc ids (HCQR::items(), apps/mainq.cpp:151-156)."""
        parts: list[np.ndarray] = []

        def walk(pix: int, lvl: int, n: HNode):
            if n.fm:
                parts.append(self._subtree_docs(pix, lvl))
                return
            if n.is_leaf_pm():
                parts.append(n.items)
            for k, c in n.children.items():
                walk(k, lvl + 1, c)

        for k, n in self.roots.items():
            walk(k, 0, n)
        if not parts:
            return np.empty(0, np.int64)
        return np.unique(np.concatenate(parts))


def _copy(n: HNode) -> HNode:
    return HNode(
        fm=n.fm,
        items=None if n.items is None else n.items,
        children={k: _copy(c) for k, c in n.children.items()},
    )
