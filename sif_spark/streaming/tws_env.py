"""transformWithState Python-protocol environment (round 10).

Spark's transformWithStateInPandas state protocol talks protobuf
between the Python worker and the JVM state server, so the `protobuf`
package — a standard PySpark extra — must be importable in BOTH the
driver process and every Python worker. This sandbox has no pip and no
installed protobuf, but ships a pure-Python protobuf inside the
google-cloud-sdk; this module packages it as a PYTHONPATH shim zip
(relaxing ONLY its advisory gencode-version gate: 6.33 gencode on a
6.32 runtime is wire-compatible; nothing in Spark or this library is
patched). With a real protobuf installed the shim is never built.

Timing constraint that makes this a SESSION-level concern rather than
an operator-level one: in local mode the Python worker daemon inherits
the environment the JVM was STARTED with — exporting PYTHONPATH after
the SparkContext exists is too late for the workers. `get_session`
therefore calls `ensure_protobuf_env()` before building the context
(best-effort, no-op when protobuf is importable), which is what lets
TWS-backed catalog entries (q167/q168) run inside the driver's own
bench/correctness sessions. Platform gate recorded in SCALE.md r9/r10.
"""

from __future__ import annotations

import os
import sys

SDK_PB = "/usr/lib/google-cloud-sdk/platform/google_appengine/google/protobuf"
SHIM = "/tmp/sif_spark_protobuf_shim.zip"


def build_shim() -> str | None:
    """Return '' if google.protobuf already imports, the shim zip path
    after (re)using it, or None when neither is possible here."""
    try:
        import google.protobuf  # noqa: F401

        return ""
    except ImportError:
        pass
    if not os.path.isdir(SDK_PB):
        return None
    if not os.path.exists(SHIM):
        import io
        import zipfile

        buf = io.BytesIO()
        base = os.path.dirname(os.path.dirname(SDK_PB))  # .../google_appengine
        with zipfile.ZipFile(buf, "w") as z:
            for root, _dirs, files in os.walk(SDK_PB):
                for f in files:
                    if not f.endswith((".py", ".pyi")):
                        continue
                    p = os.path.join(root, f)
                    arc = os.path.relpath(p, base)
                    data = open(p, "rb").read()
                    if f == "runtime_version.py":
                        # relax the advisory gencode<=runtime gate only
                        data = data.replace(
                            b"OSS_MINOR = 32", b"OSS_MINOR = 99"
                        ).replace(b"OSS_SUFFIX = '-dev'", b"OSS_SUFFIX = ''")
                    z.writestr(arc, data)
            z.writestr("google/__init__.py", b"")
        with open(SHIM, "wb") as fh:
            fh.write(buf.getvalue())
    return SHIM


def ensure_protobuf_env() -> bool:
    """Make google.protobuf importable in this process AND inheritable
    by the JVM/python workers a later SparkSession will spawn (sys.path
    for the driver, $PYTHONPATH for the workers). True iff available."""
    shim = build_shim()
    if shim is None:
        return False
    if shim == "":
        return True
    if shim not in sys.path:
        sys.path.insert(0, shim)
    pp = os.environ.get("PYTHONPATH", "")
    if shim not in pp:
        os.environ["PYTHONPATH"] = f"{shim}:{pp}" if pp else shim
    return True
