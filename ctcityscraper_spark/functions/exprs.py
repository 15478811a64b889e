"""Expression-shape helpers shared by the operator library."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind_once(expr: Column, fn: Callable[[Column], Column]) -> Column:
    """Let-binding for Spark SQL expressions: evaluate ``expr`` once per
    row and hand it to ``fn`` as a BOUND lambda variable.

    Higher-order-function lambdas are interpreted, and any outer
    expression referenced inside a lambda body is re-evaluated per
    element — ``transform(sequence(1, n), i -> f(big_expr, i))`` computes
    ``big_expr`` n times per row, turning a linear pass quadratic
    (measured 4-15x on the shingle/windowed-fingerprint operators; the
    k-means literal-in-lambda regression in OPTIMIZATION_r15.md is the
    same disease). HOF *arguments* are evaluated once, so wrapping the
    expression as the one-element array argument of a ``transform`` binds
    it to a lambda variable that the body can reference for free:
    ``get(transform(array(e), x -> fn(x)), 0)``.

    ``fn`` must be a pure expression builder; the result is semantically
    identical to ``fn(expr)`` (a null ``expr`` arrives as a null lambda
    variable, exactly as the inlined expression would evaluate).
    """
    return F.get(F.transform(F.array(expr), fn), 0)
