"""Pluggable commit protocol — the ONE primitive the lake's
optimistic concurrency stands on, behind an interface.

Every atomic publish in the engine (manifest roots, content-addressed
file-list shards, catalog pin sets, branch metas, tags) reduces to
"make <final> exist with these bytes, exactly once, losers told
apart" — create-if-absent. How that primitive is obtained differs by
storage:

- ``PosixLinkStore`` (default): write a temp file, ``os.link`` it to
  the final name — link(2) fails with EEXIST if another writer won,
  giving lock-free OCC on any POSIX filesystem (local disk, NFSv4,
  Lustre). This is the protocol the engine has always used.

- ``CatalogSwapStore``: models an OBJECT STORE (S3/GCS) deployment,
  where there is no link(2) and PUT is unconditional — last write
  wins, so the final object's existence cannot arbitrate a race. The
  only primitive trusted for mutual exclusion is an external
  compare-and-set, here a ``_catalog/<name>.ptr`` file created
  atomically-with-value, standing in for the CAS service a real
  deployment brings (DynamoDB for Delta's S3 LogStore, the Iceberg
  catalog's atomic-swap, a JDBC row). Protocol per publish:

    1. PUT the body under a UNIQUE staged name (never contended);
    2. CAS-create the pointer naming the staged object — the commit
       point; losers get EEXIST;
    3. the winner re-PUTs the staged object under the final name
       (uncontended by protocol — on S3 a server-side copy). Local
       modeling uses ``os.replace``, faithful to S3's atomic
       full-object PUT visibility (readers see all bytes or none).

  Crash safety: a winner dying between 2 and 3 leaves the pointer
  naming a staged object and no final object. The next writer to lose
  the CAS (or ``recover()``) FINISHES the winner's publish from the
  pointer before reporting the lost race — Delta's S3 commit-recovery
  semantics. Readers keep reading final names only; the pointer dir is
  writer-side bookkeeping.

Selection: ``DEXSPARK_COMMIT_STORE=posix|catalog`` (read per call, so
tests parametrize without process restarts), or ``set_store()`` for
explicit injection. Content-addressed publishes (``publish_content``)
are idempotent under both stores: identical bytes from any writer
converge on one object, so shard reuse needs no coordination.

Reference anchor: the reference delegates this entirely to Azure Blob
leases/ETags (AzureBlobServiceImpl.kt:17-31 trusts the platform's
conditional PUT); here the conditional-create contract is the
interface and the platform binding is the impl.
"""

from __future__ import annotations

import os
import shutil
import uuid

CATALOG_DIR = "_catalog"


class PosixLinkStore:
    """link(2) create-if-absent: the POSIX-filesystem commit protocol."""

    name = "posix"

    def publish(self, tmp_path: str, final_path: str) -> None:
        """Atomically publish ``tmp_path``'s bytes as ``final_path``.
        Raises FileExistsError on a lost race. Does NOT consume the
        temp file — callers unlink it in their own ``finally``."""
        os.link(tmp_path, final_path)

    def publish_content(self, content: bytes, final_path: str) -> None:
        """Idempotent publish of content-addressed bytes (the name is
        a content hash): concurrent identical writers converge."""
        if os.path.exists(final_path):
            return
        d = os.path.dirname(final_path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "wb") as fh:
            fh.write(content)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, final_path)
        except FileExistsError:
            pass  # concurrent writer published identical content
        finally:
            os.unlink(tmp)

    def mirror(self, src_path: str, final_path: str) -> None:
        """Make an already-committed object readable under a second
        name (branch forks sharing the fork-point root + shards).
        Idempotent for identical content. POSIX: hard link, so the
        copy survives removal of the source directory entry."""
        try:
            os.link(src_path, final_path)
        except FileExistsError:
            pass


class CatalogSwapStore:
    """Object-store-shaped commit: unconditional PUTs + an external
    CAS pointer (see module docstring). Never calls link(2)."""

    name = "catalog"

    @staticmethod
    def _ptr(final_path: str) -> str:
        d, name = os.path.split(final_path)
        return os.path.join(d, CATALOG_DIR, name + ".ptr")

    @staticmethod
    def _finish(ptr: str, final_path: str) -> None:
        """Commit recovery: if the pointer exists but the final object
        does not, complete the winner's step 3 from the staged object
        the pointer names. Idempotent; no-op when already finished."""
        if os.path.exists(final_path):
            return
        try:
            with open(ptr) as fh:
                staged_name = fh.read().strip()
        except FileNotFoundError:
            return
        if not staged_name.startswith(".stage-"):
            return  # malformed/foreign pointer: never touch other files
        staged = os.path.join(os.path.dirname(final_path), staged_name)
        if os.path.exists(staged):
            try:
                os.replace(staged, final_path)  # ≙ copy-PUT
            except FileNotFoundError:
                # another helper (or the live winner) completed step 3
                # between our exists() check and the move — the publish
                # stands either way
                pass

    def publish(self, tmp_path: str, final_path: str) -> None:
        d, name = os.path.split(final_path)
        ptr = self._ptr(final_path)
        if os.path.exists(ptr):
            # fast-fail, and heal a crashed winner's half-done publish
            self._finish(ptr, final_path)
            raise FileExistsError(final_path)
        os.makedirs(os.path.join(d, CATALOG_DIR), exist_ok=True)
        staged_name = f".stage-{name}-{uuid.uuid4().hex}"
        staged = os.path.join(d, staged_name)
        shutil.copyfile(tmp_path, staged)  # step 1: unique PUT
        # step 2: the CAS. A real CAS service writes name+value in ONE
        # conditional call; locally only link(2) gives that atomicity,
        # so the POINTER (the stand-in for DynamoDB/JDBC/the catalog
        # API) uses it — the OBJECT paths (roots, shards, staged,
        # final) never do, which is the property an object-store
        # deployment needs.
        ptmp = ptr + "." + uuid.uuid4().hex
        with open(ptmp, "w") as fh:
            fh.write(staged_name)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(ptmp, ptr)
        except FileExistsError:
            os.unlink(staged)
            self._finish(ptr, final_path)  # maybe finish a dead winner
            raise FileExistsError(final_path) from None
        finally:
            os.unlink(ptmp)
        # step 3: final PUT. "Uncontended" by protocol on S3 (a copy,
        # idempotent) — but the local move-based model CAN be raced by
        # a helpful loser: a racer that loses the CAS immediately runs
        # _finish() to heal what looks like a dead winner, and if it
        # lands between our CAS and this line it moves OUR staged
        # object to the final name first. The commit stands (the CAS
        # is the commit point; the bytes are ours); surfacing
        # FileNotFoundError here reported a WON race as a failure —
        # sixteen racing threads could all report "lost" with the
        # commit silently landed (caught by the race matrix under
        # co-tenant load).
        try:
            os.replace(staged, final_path)
        except FileNotFoundError:
            if not os.path.exists(final_path):
                raise  # staged genuinely gone with nothing published

    def publish_content(self, content: bytes, final_path: str) -> None:
        if os.path.exists(final_path):
            return
        d = os.path.dirname(final_path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "wb") as fh:
            fh.write(content)
            fh.flush()
            os.fsync(fh.fileno())
        # last-PUT-wins is safe: the name is a hash of the bytes, so
        # every writer's object is identical
        os.replace(tmp, final_path)

    def mirror(self, src_path: str, final_path: str) -> None:
        if os.path.exists(final_path):
            return
        d = os.path.dirname(final_path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
        shutil.copyfile(src_path, tmp)
        os.replace(tmp, final_path)

    def recover(self, directory: str) -> list[str]:
        """Finish any half-done publishes in ``directory`` (winner
        crashed between CAS and final PUT). Returns finished names."""
        cdir = os.path.join(directory, CATALOG_DIR)
        if not os.path.isdir(cdir):
            return []
        done = []
        for entry in os.listdir(cdir):
            if not entry.endswith(".ptr"):
                continue
            name = entry[: -len(".ptr")]
            final = os.path.join(directory, name)
            if not os.path.exists(final):
                self._finish(os.path.join(cdir, entry), final)
                if os.path.exists(final):
                    done.append(name)
        return done


_STORES = {"posix": PosixLinkStore(), "catalog": CatalogSwapStore()}
_OVERRIDE = None


def set_store(store) -> None:
    """Explicit injection (tests; embedding apps). ``None`` restores
    env-var selection."""
    global _OVERRIDE
    _OVERRIDE = store


def get_store():
    """The active commit store. Env var is consulted per call so a
    test (or a deployment wrapper) can switch without reimporting."""
    if _OVERRIDE is not None:
        return _OVERRIDE
    kind = os.environ.get("DEXSPARK_COMMIT_STORE", "posix")
    try:
        return _STORES[kind]
    except KeyError:
        raise ValueError(
            f"unknown DEXSPARK_COMMIT_STORE {kind!r}: "
            f"expected one of {sorted(_STORES)}"
        ) from None
