"""Expression-level ``let`` binding.

Catalyst evaluates a higher-order function's lambda BODY once per
element of its input array.  Any *outer* computed expression referenced
inside the body is therefore re-evaluated per element: a ``transform``
over an m-token document whose lambda embeds the ``split()`` that
produced the tokens costs O(m) split evaluations — O(m²) character work
per row (measured 4.3× on ``text.shingles`` at sf0.1, round 17; the
blowup grows with document length, so it is worst exactly at scale).
Subexpression elimination does not save this: higher-order functions
run as interpreted closures outside whole-stage codegen.

:func:`bind` is the expression-level ``let``: it evaluates a column
once per row and hands it to the body as a *lambda variable* (a plain
slot read per reference).  Implementation: the value rides as the
single element of a one-element array through ``transform``; ``fn``'s
result is read back with ``element_at``.  NULL semantics are unchanged
— ``array(x)`` wraps a NULL as ``[NULL]`` and the body sees NULL
exactly as it would have inline.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, functions as F


def bind(value: Column, fn: Callable[[Column], Column]) -> Column:
    """``let v = value in fn(v)`` — evaluate ``value`` ONCE per row.

    Use whenever a lambda body would otherwise reference a computed
    outer column (the per-element re-evaluation trap above).  Plain
    attribute references and literals don't need it.

    CONSTRAINT (ADVICE r17 #3): ``value`` and the body ``fn`` builds
    must be pure ROW-LEVEL expressions — no aggregates, no window
    functions, no nondeterministic expressions, and no generator
    (``explode``-class) input — because both execute inside a
    higher-order-function lambda, where Catalyst rejects those forms
    at analysis time with an error far from this call site.  Audits of
    lambda call sites (the ARCHITECTURE.md audit rule) should treat a
    ``bind`` body exactly like any other HOF lambda body.
    """
    return F.element_at(F.transform(F.array(value), fn), 1)
