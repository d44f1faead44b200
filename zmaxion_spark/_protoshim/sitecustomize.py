"""Sandbox-only protobuf shim for the #114 transformWithState slot.

This container ships NO installable ``google.protobuf`` (and pip is
unavailable), but the host's google-cloud-sdk bundles a PURE-PYTHON
Apache-2.0 protobuf runtime (6.32.0) under its App Engine platform
directory. pyspark 4.1.2's generated ``StateMessage_pb2`` was built
with protoc 6.33.0 and its runtime-version gate rejects any older
runtime — one MINOR behind, same major, where the python builder API
and wire format are stable.

This module, when its directory is placed on ``PYTHONPATH`` (the
``site`` module auto-imports ``sitecustomize`` from ``sys.path`` at
interpreter start, which is how Spark's forked Python WORKERS and the
transformWithState pre-init runner pick it up), makes that runtime
importable as ``google.protobuf`` and relaxes the version gate to
same-major only.

Trap this shim defuses: Spark's streaming runners put
``spark-core_*.jar`` itself on ``sys.path``, and the jar's internal
``google/protobuf/*.proto`` RESOURCE directories import as an empty
NAMESPACE package — ``import google.protobuf`` "succeeds" while
``from google.protobuf import descriptor`` dies with "unknown
location". A real runtime is therefore detected by importing the
``descriptor`` module, never the bare package; namespace shadows are
purged from ``sys.modules`` before retrying.

SCOPE: a sandbox workaround so the transformWithState topology can
EXECUTE here. A real deployment installs ``protobuf>=6.33`` on driver
and executors and never loads this file.
"""

from __future__ import annotations

import importlib
import os
import sys

_FALLBACK_RUNTIMES = [
    # google-cloud-sdk App Engine platform: pure-python protobuf 6.32
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
]


def _real_runtime_loaded() -> bool:
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _runtime_is_fallback() -> bool:
    """True iff the loaded ``google.protobuf`` came from _FALLBACK_RUNTIMES."""
    mod = sys.modules.get("google.protobuf")
    origin = getattr(mod, "__file__", None) or ""
    return any(origin.startswith(root + os.sep) for root in _FALLBACK_RUNTIMES)


def ensure_protobuf() -> bool:
    """Make a REAL ``google.protobuf`` importable; True on success.

    The version-gate relaxation is applied ONLY when the runtime in use
    is one of the known stale sandbox fallbacks — a genuinely installed
    protobuf keeps its own compatibility check untouched."""
    if _real_runtime_loaded():
        if _runtime_is_fallback():
            _relax_version_gate()
        return True
    for root in _FALLBACK_RUNTIMES:
        if not os.path.isdir(os.path.join(root, "google", "protobuf")):
            continue
        if root not in sys.path:
            # APPEND so genuinely-installed packages always win.
            sys.path.append(root)
        # Purge namespace-package shadows (e.g. from spark-core.jar's
        # google/protobuf resource dirs) so the regular package is
        # re-resolved against the extended path.
        for name in [m for m in sys.modules if m == "google" or m.startswith("google.")]:
            mod = sys.modules[name]
            if getattr(mod, "__file__", None) is None:
                del sys.modules[name]
        importlib.invalidate_caches()
        if _real_runtime_loaded():
            if _runtime_is_fallback():
                _relax_version_gate()
            return True
    return False


def _relax_version_gate() -> None:
    """Accept gencode a few minors AHEAD of the runtime (same major).

    protobuf's own guarantee forbids runtime < gencode; for the python
    pure runtime the builder API and wire format are stable across 6.x
    minors, and this shim exists precisely because the sandbox cannot
    install the matching runtime. Cross-MAJOR mismatches still raise."""
    try:
        from google.protobuf import runtime_version as rv
    except ImportError:
        return
    if getattr(rv.ValidateProtobufRuntimeVersion, "_zmx_lenient", False):
        return
    orig = rv.ValidateProtobufRuntimeVersion

    def lenient(domain, major, minor, patch, suffix, location):  # noqa: ANN001
        try:
            orig(domain, major, minor, patch, suffix, location)
        except rv.VersionError:
            if major != rv.OSS_MAJOR:
                raise

    lenient._zmx_lenient = True  # type: ignore[attr-defined]
    rv.ValidateProtobufRuntimeVersion = lenient


def enable_worker_protobuf(spark) -> bool:
    """Opt a session's Python WORKERS into the shim.

    Prepends this directory to the worker ``PYTHONPATH`` (merged, not
    replaced, by Spark's worker factory) so forked workers auto-import
    this module as ``sitecustomize`` at startup — the state-server
    wire client imports ``StateMessage_pb2`` before any user code
    runs, so the shim must be active that early. NOTE: the
    transformWithState PRE-INIT runner is spawned with the env the
    JVM inherited at session launch, so ``PYTHONPATH`` must ALSO
    contain this directory in the environment that builds the
    SparkSession (tests do this; see tests/test_streaming.py). Applies
    the shim driver-side too. Returns False (and changes nothing)
    when no fallback runtime exists on this host."""
    if not ensure_protobuf():
        return False
    here = os.path.dirname(os.path.abspath(__file__))
    sc = spark.sparkContext
    cur = sc.environment.get("PYTHONPATH", "")
    if here not in cur.split(os.pathsep):
        sc.environment["PYTHONPATH"] = (
            here + (os.pathsep + cur if cur else "")
        )
    return True


class scoped_worker_protobuf:
    """Context manager: enable_worker_protobuf on enter, restore the
    session's prior worker PYTHONPATH on exit (so the shim's reach ends
    with the query that needed it). ``bool(ctx.enabled)`` tells the
    caller whether a runtime was found."""

    def __init__(self, spark) -> None:  # noqa: ANN001
        self._spark = spark
        self.enabled = False
        self._prev: str | None = None

    def __enter__(self) -> "scoped_worker_protobuf":
        env = self._spark.sparkContext.environment
        self._prev = env.get("PYTHONPATH")
        self.enabled = enable_worker_protobuf(self._spark)
        return self

    def __exit__(self, *exc) -> None:  # noqa: ANN002
        env = self._spark.sparkContext.environment
        if self._prev is None:
            env.pop("PYTHONPATH", None)
        else:
            env["PYTHONPATH"] = self._prev


# Auto-activation is OPT-IN: it fires when this file is imported as the
# interpreter-startup ``sitecustomize`` hook (i.e. its directory was
# deliberately placed on PYTHONPATH — the worker/pre-init path) or when
# ZMX_PROTOSHIM=1 is set. A plain package import of
# ``zmaxion_spark._protoshim`` has no side effect; callers invoke
# ensure_protobuf()/scoped_worker_protobuf explicitly.
if __name__ == "sitecustomize" or os.environ.get("ZMX_PROTOSHIM") == "1":
    ensure_protobuf()
