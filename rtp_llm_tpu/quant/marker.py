"""Pytree-static quant-scheme markers for weight dicts.

A ``QuantMarker`` tags a weights-dict entry (``<name>.int4p`` / ``.fp4`` /
``.w4a8`` / ``.w8a8``) to select the matmul path at trace time. It is
registered as a LEAFLESS pytree node: jax.jit sees it as part of the
argument STRUCTURE (static), never as a program operand.

Why not a 0-d bool array: the old array markers rode along as ~112 unused
program parameters on a 7B model — per-dispatch argument-handling work and
jit-signature noise for values that are only ever tested for PRESENCE at
trace time. (They also sat awkwardly in generic weights plumbing: 0-d
leaves needed special-casing in shard-spec sizing and broke the
converted-weights cache's byte serialization.)

Presence checks (``name + ".w8a8" in w``) and dict copies behave exactly
as before; the numpy-compat attrs keep generic weight plumbing (shard-spec
sizing, per-layer splitting, byte accounting) working without special
cases.
"""

from __future__ import annotations

import jax


class QuantMarker:
    _cache: dict = {}

    def __new__(cls, tag: str = "1"):
        m = cls._cache.get(tag)
        if m is None:
            m = super().__new__(cls)
            m.tag = tag
            cls._cache[tag] = m
        return m

    def __repr__(self):
        return f"QuantMarker({self.tag!r})"

    def __reduce__(self):  # pickle-stable (weight dict round-trips)
        return (QuantMarker, (self.tag,))

    # numpy-compat no-ops for generic weights plumbing
    ndim = 0
    shape = ()
    nbytes = 0


jax.tree_util.register_pytree_node(
    QuantMarker, lambda m: ((), m.tag), lambda tag, _: QuantMarker(tag))
MARKER = QuantMarker()
