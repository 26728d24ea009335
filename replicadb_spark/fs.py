"""Table-metadata filesystem access via the session's Hadoop FileSystem.

The snapshot table's commit log (operators/snapshot_table) and the
file-skipping manifest (operators/manifest) must work on ANY URI Spark
itself can read — ``file://``, ``hdfs://``, ``s3a://``, ``abfs://`` —
not just the driver's local POSIX tree. Python's ``os`` module only
speaks the latter, so every metadata operation here goes through the
JVM's ``org.apache.hadoop.fs.FileSystem`` for the table's scheme (py4j;
the same FS instance Spark's own scan planning uses, so credentials,
``fs.*`` conf and scheme registration are inherited for free).

Design notes (mirrors Delta's LogStore contract):

- **Commit point = rename-without-overwrite.** ``rename_no_overwrite``
  raises if the destination exists. The atomicity of that put-if-absent
  is HDFS's: its namespace rename is one metadata op that fails on an
  existing destination. On ``file://`` Hadoop's rename also refuses an
  existing destination (verified against the bundled Hadoop: returns
  false, no overwrite) and we add a best-effort exists() pre-check, but
  POSIX rename(2) underneath CAN overwrite, so local concurrent-writer
  detection is best-effort only — the single-writer replication
  contract (SURVEY §2.3) is what actually carries it. On S3 a rename is
  copy+delete and NOT atomic; as with Delta on S3, multi-writer safety
  there needs an external coordinator — same single-writer contract.
- **Caller-prefix path form.** Every path this module RETURNS keeps the
  exact prefix the caller used for the table root (plain ``/tmp/t``,
  ``file:///tmp/t``, ``s3a://bucket/t`` …): listings are re-anchored
  from Hadoop's fully-qualified form back onto the caller's root. The
  manifest stores these strings, Spark reads them back, and set
  operations (victim pruning, GC set-difference) compare equal — no
  ``file:/`` vs ``/`` representation drift.
- **Executor-side data access stays in pyarrow** (``pyarrow_open`` /
  ``pyarrow_fs_for``): footer reads, stat calls and GC deletes run
  distributed inside Arrow tasks where the JVM gateway does not exist.

The reference hands this durability problem to the sink database
(SqlManager.java:404-434 swaps sink tables inside one transaction);
this module is the repo's equivalent contract for lakehouse layouts.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def join(*parts: str) -> str:
    """URI-safe path join: ``join('s3a://b/t', 'data')``. Never uses
    ``os.path`` (which would mangle ``scheme://`` on Windows-style
    normalization and knows nothing about URIs)."""
    out = parts[0].rstrip("/")
    for p in parts[1:]:
        out += "/" + p.strip("/")
    return out


def _is_not_found(err: Exception) -> bool:
    s = str(err)
    return "FileNotFoundException" in s or "No such file" in s


class TableFS:
    """Hadoop-FS metadata operations for one table root, path-stable in
    the caller's own prefix form (see module docstring)."""

    def __init__(self, spark: SparkSession, root: str):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        jroot = self._jvm.org.apache.hadoop.fs.Path(root)
        self._fs = jroot.getFileSystem(self._conf)
        self.root = root.rstrip("/")
        self._qual_root = (
            self._fs.makeQualified(jroot).toString().rstrip("/")
        )

    # -- path plumbing ---------------------------------------------------
    def _jpath(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def unqualify(self, qualified: str) -> str:
        """Hadoop's fully-qualified URI → the caller-prefix form, so
        listings compare equal to manifest-stored strings."""
        if qualified.startswith(self._qual_root):
            return self.root + qualified[len(self._qual_root):]
        return qualified

    def qualify(self, p: str) -> str:
        """Hadoop's fully-qualified form of ``p`` — the spelling-free
        identity used to check that two differently-written prefixes
        (``/tmp/t`` vs ``file:///tmp/t``) name the same location."""
        return self._fs.makeQualified(self._jpath(p)).toString().rstrip("/")

    @property
    def qualified_root(self) -> str:
        return self._qual_root

    # -- predicates ------------------------------------------------------
    def exists(self, p: str) -> bool:
        return bool(self._fs.exists(self._jpath(p)))

    def is_dir(self, p: str) -> bool:
        jp = self._jpath(p)
        return bool(self._fs.exists(jp) and self._fs.getFileStatus(jp).isDirectory())

    # -- directory ops ---------------------------------------------------
    def mkdirs(self, p: str) -> None:
        self._fs.mkdirs(self._jpath(p))

    def list_names(self, d: str) -> "list[str]":
        """Child entry names of ``d`` (one level); [] if ``d`` missing."""
        try:
            statuses = self._fs.listStatus(self._jpath(d))
        except Exception as e:  # py4j-wrapped FileNotFoundException
            if _is_not_found(e):
                return []
            raise
        return sorted(s.getPath().getName() for s in statuses)

    def glob(self, pattern: str) -> "list[tuple[str, int]]":
        """``(path, size)`` for files matching a Hadoop glob pattern
        (e.g. ``<root>/data/*/*.parquet``) — one FS round trip for the
        match, paths returned in caller-prefix form."""
        statuses = self._fs.globStatus(self._jpath(pattern))
        if statuses is None:
            return []
        return sorted(
            (self.unqualify(s.getPath().toString()), int(s.getLen()))
            for s in statuses
            if s.isFile()
        )

    # -- small-file (commit record) I/O ----------------------------------
    def read_text(self, p: str) -> str:
        stream = self._fs.open(self._jpath(p))
        try:
            data = self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        finally:
            stream.close()
        return bytes(data).decode("utf-8")

    def write_text(self, p: str, text: str) -> None:
        """Create/overwrite ``p`` with ``text``, durably as the scheme
        allows (hsync where supported — local checksum FS and object
        stores refuse it; their close() is the durability point)."""
        out = self._fs.create(self._jpath(p), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
            try:
                out.hsync()
            except Exception:
                pass  # scheme without hsync: close() flushes
        finally:
            out.close()

    def rename_no_overwrite(self, src: str, dst: str) -> None:
        """THE commit point: publish by renaming onto a name that must
        not exist. Put-if-absent is ATOMIC on HDFS (namespace rename
        fails on an existing destination); on ``file://`` Hadoop's
        rename also returns false for an existing destination and the
        exists() pre-check below adds a second best-effort guard, but
        neither closes the POSIX rename(2) overwrite race — local and
        object stores rely on the single-writer contract (module
        docstring)."""
        if self.exists(dst):
            raise IOError(
                f"commit rename {src} -> {dst} failed: destination "
                "already exists (concurrent writer?)"
            )
        if not self._fs.rename(self._jpath(src), self._jpath(dst)):
            detail = (
                "destination already exists (concurrent writer?)"
                if self.exists(dst)
                else "filesystem refused the rename"
            )
            raise IOError(f"commit rename {src} -> {dst} failed: {detail}")

    def delete(self, p: str, recursive: bool = False) -> bool:
        return bool(self._fs.delete(self._jpath(p), recursive))

    def mtime_ms(self, p: str) -> int:
        """Modification time of ``p`` in epoch milliseconds. For a
        directory, the max of the directory's own mtime and its direct
        children's (a fresh child marks the tree recent even on schemes
        whose dir mtime is lazy) — the age signal snapshot_expire's
        ``orphan_grace_ms`` sweeps use to spare in-flight OCC commits.
        Missing path → 0 (treated as ancient; a racing delete already
        won)."""
        try:
            st = self._fs.getFileStatus(self._jpath(p))
        except Exception as e:
            if _is_not_found(e):
                return 0
            raise
        newest = int(st.getModificationTime())
        if st.isDirectory():
            try:
                for child in self._fs.listStatus(self._jpath(p)):
                    newest = max(newest, int(child.getModificationTime()))
            except Exception as e:
                if not _is_not_found(e):
                    raise
        return newest


# -- executor-side helpers (no JVM gateway in Arrow tasks) ----------------

def pyarrow_uri(path: str) -> str:
    """Translate a Hadoop-spelled URI into the spelling pyarrow's
    ``FileSystem.from_uri`` understands: Hadoop says ``s3a://`` (and
    legacy ``s3n://``) where pyarrow only registers ``s3://``. Other
    schemes pass through unchanged — ``hdfs://`` matches pyarrow's own
    name; ``abfs://``/``gs://`` support depends on the pyarrow build
    and surfaces as from_uri's loud unrecognized-scheme error."""
    for hadoop_scheme in ("s3a://", "s3n://"):
        if path.startswith(hadoop_scheme):
            return "s3://" + path[len(hadoop_scheme):]
    return path


def pyarrow_fs_for(path: str):
    """``(pyarrow FileSystem, fs-local path)`` for one file string in
    caller-prefix form — local paths and ``file:`` URIs resolve to the
    LocalFileSystem, other schemes through ``FileSystem.from_uri``
    after ``pyarrow_uri`` scheme translation (support for a scheme
    depends on the pyarrow build, surfacing as a loud
    unrecognized-scheme error, never silent data loss)."""
    import pyarrow.fs as pafs

    if path.startswith("file:"):
        local = path[5:]
        while local.startswith("//"):  # file:///x and file://x → /x
            local = local[1:]
        return pafs.LocalFileSystem(), local
    if "://" in path:
        return pafs.FileSystem.from_uri(pyarrow_uri(path))
    return pafs.LocalFileSystem(), path


def pyarrow_open(path: str):
    """Open one data file for reading inside an executor task."""
    fs, p = pyarrow_fs_for(path)
    return fs.open_input_file(p)
