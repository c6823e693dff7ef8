"""Memory circuit breaker: fail fast with a clear error instead of an
executor OOM.

The analog of the reference's native-memory circuit breaker settings
(KNNSettings.java:69-94 — knn.memory.circuit_breaker.enabled / .limit
gate index loads against a byte budget). Spark has no per-operator memory
admission control, so the enforcement point here is the DRIVER-side cost
estimate right before a kernel whose working set is data-dependent:
a vector-index bucket that a probe or build pass materializes, a broadcast
training/query state, etc. The estimate is conservative-by-construction
(mean sizes, documented per call site); a tripped breaker names the
estimate, the cap, and the knob that raises it.

Cap resolution order (per check): explicit argument > Spark session conf
``spark.ojs.breaker.<name>`` > unlimited. Unlimited-by-default mirrors the
reference's breaker being disabled unless configured.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


class CircuitBreakerError(RuntimeError):
    """Estimated working-set bytes exceed the configured budget."""


def resolve_cap(
    name: str,
    explicit: int | None = None,
    spark: SparkSession | None = None,
) -> int | None:
    """Byte cap for breaker `name`: explicit arg wins, else the session
    conf ``spark.ojs.breaker.<name>``, else None (breaker off)."""
    if explicit is not None:
        return int(explicit)
    if spark is not None:
        v = spark.conf.get(f"spark.ojs.breaker.{name}", None)
        if v is not None:
            return int(v)
    return None


def check_bytes(
    name: str,
    estimated_bytes: int,
    cap_bytes: int | None,
    detail: str = "",
) -> None:
    """Raise CircuitBreakerError when `estimated_bytes` exceeds the cap.

    No-op when cap_bytes is None (breaker unconfigured)."""
    if cap_bytes is None or estimated_bytes <= cap_bytes:
        return
    raise CircuitBreakerError(
        f"circuit breaker [{name}] tripped: estimated {estimated_bytes:,} "
        f"bytes exceeds the {cap_bytes:,}-byte budget"
        + (f" ({detail})" if detail else "")
        + f". Raise spark.ojs.breaker.{name} or restructure the workload."
    )
