"""Pluggable commit protocol for SifTable manifests (VERDICT r10 #1).

SifTable's snapshot isolation reduces to ONE primitive: atomically
publish a fully-written manifest at ``.../_manifests/vNNN.json`` iff
nothing exists there yet (put-if-absent). Everything else — data
groups, readers, retries — is already safe around it. Where that
primitive comes from depends on the storage system:

- **HadoopRenameLogStore** (default): tmp write + ``FileSystem.
  rename()``. Hadoop rename fails when the destination exists and is
  atomic on local FS and HDFS — the exact protocol the r10 SIGKILL
  probes proved. NOT safe on S3-class object stores, where "rename"
  is a non-atomic copy+delete and two racers can both think they won.
- **PosixExclLogStore**: pure-POSIX conditional put — write the tmp
  file fully (fsync), then ``os.link(tmp, dst)``, which the kernel
  rejects with EEXIST atomically if dst exists. This is the
  reference implementation of the *conditional-put* shape an object
  store offers natively (S3 ``If-None-Match: *``, GCS
  ``ifGenerationMatch=0``, Azure ``If-None-Match``): publish is
  all-or-nothing AND exclusive, with no rename anywhere. A real
  object-store impl subclasses ConditionalPutLogStore with the
  store's own primitive; the table logic never changes.
- **ConditionalPutLogStore**: adapter base — supply the store's
  put-if-absent callable; reads/list/delete default to local paths
  and can be overridden per store.

Why this matters at 100 TB: the table LIVES on object storage there,
and a commit protocol that silently loses one writer's manifest under
a race turns "snapshot isolation" into corruption. Same division of
labor as Delta's LogStore interface (public design; implementation
here is original).

Tests drive the protocol through an ADVERSARIAL non-atomic-rename
store (tests/test_logstore.py): a shim whose rename is
read+write+delete with a deterministic interleave window shows the
naive protocol double-commits, and the same race through
PosixExclLogStore yields exactly one winner and a contiguous version
chain.

Reference: the reference engine has no write path at all
(SURVEY.md §2.1); this extends sif_spark/table.py's commit contract.
"""

from __future__ import annotations

import os
from abc import ABC, abstractmethod
from collections.abc import Callable


class LogStore(ABC):
    """Manifest I/O + the atomic publish primitive. Paths are the
    table's own manifest paths (str). Implementations must be safe to
    construct cheaply and to call from multiple processes."""

    @abstractmethod
    def read_text(self, path: str) -> str: ...

    @abstractmethod
    def put_if_absent(self, path: str, content: str) -> bool:
        """Publish ``content`` at ``path`` iff nothing exists there.
        Returns True on win, False when the destination already
        exists (another writer committed first). Must be atomic: a
        reader never observes a partial file, and two racers never
        both get True."""

    @abstractmethod
    def list_names(self, directory: str) -> list[str]:
        """File names (not paths) in ``directory``; [] if missing."""

    @abstractmethod
    def delete(self, path: str) -> None: ...


class HadoopRenameLogStore(LogStore):
    """Default: Hadoop FileSystem tmp+rename CAS. Valid where rename
    is atomic and fails-on-existing (local FS, HDFS). Carries the
    SparkSession to reach the JVM-side FileSystem."""

    def __init__(self, spark):
        self.spark = spark

    def _fs(self, path: str):
        jvm = self.spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        return p.getFileSystem(self.spark._jsc.hadoopConfiguration()), p, jvm

    def read_text(self, path: str) -> str:
        fs, p, jvm = self._fs(path)
        stream = fs.open(p)
        try:
            # commons-io ships on Spark's classpath; a py4j-side buffer
            # loop can't work (Java writes into a COPY of the bytearray)
            data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            return bytes(data).decode("utf-8")
        finally:
            stream.close()

    def put_if_absent(self, path: str, content: str) -> bool:
        import uuid

        parent = path.rsplit("/", 1)[0]
        tmp = f"{parent}/.tmp-{uuid.uuid4().hex[:12]}"
        fs, tp, jvm = self._fs(tmp)
        out = fs.create(tp, True)
        try:
            out.write(bytearray(content.encode("utf-8")))
        finally:
            out.close()
        dst = jvm.org.apache.hadoop.fs.Path(path)
        if not fs.rename(tp, dst):
            fs.delete(tp, False)
            return False
        return True

    def list_names(self, directory: str) -> list[str]:
        fs, p, _ = self._fs(directory)
        if not fs.exists(p):
            return []
        return [s.getPath().getName() for s in fs.listStatus(p)]

    def delete(self, path: str) -> None:
        fs, p, _ = self._fs(path)
        fs.delete(p, False)


class PosixExclLogStore(LogStore):
    """Conditional-put via POSIX ``link(2)``: the kernel's EEXIST on
    an existing destination IS the compare-and-swap — no rename, no
    check-then-act window. The local reference implementation of the
    object-store conditional-put shape; also valid on NFS (link is
    the classic NFS-safe lock primitive)."""

    def read_text(self, path: str) -> str:
        with open(path, encoding="utf-8") as fh:
            return fh.read()

    def put_if_absent(self, path: str, content: str) -> bool:
        import uuid

        parent = os.path.dirname(path)
        os.makedirs(parent, exist_ok=True)
        tmp = os.path.join(parent, f".tmp-{uuid.uuid4().hex[:12]}")
        fd = os.open(tmp, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o644)
        try:
            os.write(fd, content.encode("utf-8"))
            os.fsync(fd)  # the link must publish COMPLETE bytes
        finally:
            os.close(fd)
        try:
            os.link(tmp, path)  # atomic: EEXIST iff someone else won
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def list_names(self, directory: str) -> list[str]:
        if not os.path.isdir(directory):
            return []
        return os.listdir(directory)

    def delete(self, path: str) -> None:
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass


class ConditionalPutLogStore(PosixExclLogStore):
    """Adapter for a real object store: supply the store's own
    put-if-absent primitive (e.g. an S3 PUT with ``If-None-Match: *``
    that maps 412 -> False); read/list/delete inherit local-path
    behavior and should be overridden with the store's GET/LIST/DELETE
    for a fully remote table."""

    def __init__(self, put_if_absent: Callable[[str, str], bool]):
        self._put = put_if_absent

    def put_if_absent(self, path: str, content: str) -> bool:
        return self._put(path, content)
