"""Associative-scan formulation: transition-function composition.

The automaton recurrence s' = delta(s, c) is associative under composition
of the per-symbol transition *functions*: each symbol c denotes the map
f_c = delta[:, c] (an [S]-vector), and (f ∘ g)[s] = f[g[s]] is associative,
so `jax.lax.associative_scan` evaluates all prefixes in O(log T) depth —
the classic simultaneous-DFA construction (SURVEY.md §5 "long-context /
sequence parallelism", option (a)).

Cost model: each compose step gathers S entries per position, so total work
is O(T·S·log T) vs the blocked scan's O(T) gathers — the blocked+halo path
(ops/blocking.py) wins for every realistic dictionary and is the production
path. This formulation is kept (and tested) because it is exact for *any*
halo-free automaton — including hypothetical machines whose state depends
on unbounded history where halo re-derivation would not apply — and as the
log-depth option for tiny automata with extreme sequence lengths.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax


@lru_cache(maxsize=None)
def make_assoc_scan(V: int):
    """Returns scan(delta, ids) -> states[T] via associative composition.

    delta: int32 [S, V] fail-collapsed table; ids: int32 [T].
    states[t] equals the sequential recurrence's state after ids[t].
    Memory: materializes [T, S] function vectors — small S only.
    """

    @jax.jit
    def scan(delta, ids):
        fns = delta.T[ids]               # [T, S]: f_t = delta[:, c_t]

        def compose(g, f):
            # apply g first, then f (time order); batched over leading dims
            return jnp.take_along_axis(f, g, axis=-1)

        prefixes = lax.associative_scan(compose, fns, axis=0)  # [T, S]
        return prefixes[:, 0]            # start state = root

    return scan
