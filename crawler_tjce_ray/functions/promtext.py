"""Dependency-free Prometheus metrics: the reference instruments its
crawler with prometheus_client (metrics.py:6-70 — requests/records/
errors counters, a duration histogram and an active-requests gauge,
all labeled by entity); that package is not in this container, so this
module implements the same metric families and the text exposition
format (version 0.0.4) from the public spec.

Served at ``GET /metrics`` by serve.py.
"""

from __future__ import annotations

import threading
import time
from functools import wraps


def _fmt_labels(labels: dict[str, str]) -> str:
    if not labels:
        return ""
    inner = ",".join(
        f'{k}="{str(v).replace(chr(92), chr(92) * 2).replace(chr(34), chr(92) + chr(34))}"'
        for k, v in sorted(labels.items())
    )
    return "{" + inner + "}"


def _fmt_value(v: float) -> str:
    if v == float("inf"):
        return "+Inf"
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return repr(v)


class _Metric:
    kind = "untyped"

    def __init__(self, name: str, help_text: str, label_names: tuple[str, ...]):
        self.name = name
        self.help = help_text
        self.label_names = label_names
        self._values: dict[tuple, float] = {}
        self._lock = threading.Lock()

    def labels(self, **labels):
        key = tuple(str(labels[n]) for n in self.label_names)
        return _Bound(self, key)

    def _add(self, key: tuple, delta: float) -> None:
        with self._lock:
            self._values[key] = self._values.get(key, 0.0) + delta

    def _set(self, key: tuple, value: float) -> None:
        with self._lock:
            self._values[key] = value

    def expose(self) -> list[str]:
        lines = [f"# HELP {self.name} {self.help}",
                 f"# TYPE {self.name} {self.kind}"]
        with self._lock:
            for key in sorted(self._values):
                labels = dict(zip(self.label_names, key))
                lines.append(
                    f"{self.name}{_fmt_labels(labels)} "
                    f"{_fmt_value(self._values[key])}"
                )
        return lines


class _Bound:
    def __init__(self, metric: _Metric, key: tuple):
        self._m = metric
        self._k = key

    def inc(self, amount: float = 1.0) -> None:
        self._m._add(self._k, amount)

    def dec(self, amount: float = 1.0) -> None:
        self._m._add(self._k, -amount)

    def set(self, value: float) -> None:
        self._m._set(self._k, value)

    def observe(self, value: float) -> None:
        self._m._observe(self._k, value)  # histograms only


class Counter(_Metric):
    kind = "counter"


class Gauge(_Metric):
    kind = "gauge"


class Histogram(_Metric):
    kind = "histogram"

    def __init__(self, name, help_text, label_names, buckets):
        super().__init__(name, help_text, label_names)
        self.buckets = tuple(sorted(buckets)) + (float("inf"),)
        self._bucket_counts: dict[tuple, list[int]] = {}
        self._sums: dict[tuple, float] = {}

    def _observe(self, key: tuple, value: float) -> None:
        with self._lock:
            counts = self._bucket_counts.setdefault(
                key, [0] * len(self.buckets)
            )
            for i, b in enumerate(self.buckets):
                if value <= b:
                    counts[i] += 1
            self._sums[key] = self._sums.get(key, 0.0) + value

    def expose(self) -> list[str]:
        lines = [f"# HELP {self.name} {self.help}",
                 f"# TYPE {self.name} histogram"]
        with self._lock:
            for key in sorted(self._bucket_counts):
                labels = dict(zip(self.label_names, key))
                counts = self._bucket_counts[key]
                for b, c in zip(self.buckets, counts):
                    lines.append(
                        f"{self.name}_bucket"
                        f"{_fmt_labels({**labels, 'le': _fmt_value(b)})} {c}"
                    )
                lines.append(
                    f"{self.name}_sum{_fmt_labels(labels)} "
                    f"{_fmt_value(self._sums[key])}"
                )
                lines.append(
                    f"{self.name}_count{_fmt_labels(labels)} {counts[-1]}"
                )
        return lines


class Registry:
    """The reference's metric families (metrics.py:6-27), one registry
    per process (serve.py holds the default one)."""

    def __init__(self) -> None:
        self.requests_total = Counter(
            "crawler_requests_total",
            "Total de requisições feitas à API", ("entity",),
        )
        self.request_duration = Histogram(
            "crawler_request_duration_seconds",
            "Duração das requisições", ("entity",),
            buckets=[0.1, 0.5, 1.0, 2.0, 5.0, 10.0],
        )
        self.records_processed = Counter(
            "crawler_records_processed_total",
            "Total de registros processados", ("entity",),
        )
        self.errors_total = Counter(
            "crawler_errors_total",
            "Total de erros ocorridos", ("type", "entity"),
        )
        self.active_requests = Gauge(
            "crawler_active_requests",
            "Número de requisições ativas", ("entity",),
        )

    def exposition(self) -> str:
        """The /metrics payload (text format 0.0.4)."""
        lines: list[str] = []
        for m in (self.requests_total, self.request_duration,
                  self.records_processed, self.errors_total,
                  self.active_requests):
            lines.extend(m.expose())
        return "\n".join(lines) + "\n"

    def track_time(self, entity: str = "unknown_entity_metric"):
        """The reference's ``track_time`` decorator analog
        (metrics.py:29-70): duration + count + error-typed counters."""
        def deco(func):
            @wraps(func)
            def wrapper(*args, **kwargs):
                start = time.time()
                self.active_requests.labels(entity=entity).inc()
                self.requests_total.labels(entity=entity).inc()
                try:
                    result = func(*args, **kwargs)
                    self.request_duration.labels(entity=entity).observe(
                        time.time() - start
                    )
                    return result
                except Exception as e:
                    self.errors_total.labels(
                        type=type(e).__name__, entity=entity
                    ).inc()
                    raise
                finally:
                    self.active_requests.labels(entity=entity).dec()
            return wrapper
        return deco
