"""Package access to the protobuf shim (see sitecustomize.py in this
directory — the same file doubles as the worker-side site hook)."""

from zmaxion_spark._protoshim.sitecustomize import (  # noqa: F401
    enable_worker_protobuf,
    ensure_protobuf,
    scoped_worker_protobuf,
)
