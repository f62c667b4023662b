"""Opt-in protobuf compatibility shim for transformWithStateInPandas.

The sandbox image ships Spark 4 without `google.protobuf`, which the
Python<->JVM state-server wire protocol of transformWithStateInPandas
needs on BOTH the driver and every Python worker. The image does carry
a pure-Python protobuf runtime 6.32.0 vendored inside the Google Cloud
SDK; pyspark's generated StateMessage_pb2 was built by protoc 6.33.0,
and protobuf's runtime check rejects a same-major OLDER-minor runtime
outright.

This sitecustomize (auto-imported by `site` in every interpreter whose
PYTHONPATH includes this directory — driver, daemon, workers) makes
that vendored runtime usable:

1. adds the GCloud SDK vendored tree to sys.path ONLY if
   `google.protobuf` is not importable already (a real install wins);
2. relaxes ValidateProtobufRuntimeVersion to tolerate a same-major
   older-minor runtime (6.32 loading 6.33 gencode), still raising on a
   major-version mismatch. Within a major version protobuf guarantees
   wire compatibility; the minor gate protects gencode API additions,
   and StateMessage_pb2 uses none newer than 6.32 (pinned by the
   end-to-end test: a full transformWithStateInPandas run through the
   RocksDB state store).

NEVER put this directory on the default PYTHONPATH: it is scoped to
the transform-with-state e2e test's subprocess (and to a production
image that consciously opts in), so a proper `pip install protobuf`
environment is untouched.
"""

import os
import sys

_VENDORED = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _activate() -> None:
    try:
        # probe a concrete module, not the package: Spark workers get
        # spark-core.jar on PYTHONPATH, and the jar's bundled .proto
        # resource tree makes `import google.protobuf` succeed as an
        # EMPTY namespace package — only `descriptor` proves a real
        # python runtime is present
        from google.protobuf import descriptor  # noqa: F401
        return
    except ImportError:
        pass
    if not os.path.isdir(os.path.join(_VENDORED, "google", "protobuf")):
        return  # nothing to shim with; imports will fail loudly later
    sys.path.append(_VENDORED)
    # the failed probe cached the jar's empty namespace packages in
    # sys.modules; drop them so the retry resolves the vendored tree
    for name in ("google.protobuf", "google"):
        mod = sys.modules.get(name)
        if mod is not None and getattr(mod, "__file__", None) is None:
            del sys.modules[name]
    try:
        from google.protobuf import runtime_version as rv
    except ImportError:
        return
    orig = rv.ValidateProtobufRuntimeVersion

    def lax(domain, major, minor, patch, suffix, location):
        try:
            orig(domain, major, minor, patch, suffix, location)
        except rv.VersionError:
            if major != rv.MAJOR:
                raise

    rv.ValidateProtobufRuntimeVersion = lax


_activate()
