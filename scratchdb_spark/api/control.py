"""Durable control-plane records: share links, API keys, admin key.

Reference parity: the reference persists both shares and keys in its
database so they survive a service restart (storage/database/gorm/
gorm.go:93-129 share CRUD with the expiry predicate at :112;
gorm.go:202-205 hashed-key lookup). Here the store is the warehouse
itself: one small JSON document per record under
``{warehouse_root}/_control/``, written through the Hadoop FS API so
the same code persists to local disk, HDFS, or an object store.

Why a doc-per-record instead of one parquet control table: every
mutation is then a single-file PUT — atomic on every relevant FS, no
read-modify-write race between API workers, no Spark job on the
control path (a query-per-auth-check would put a scheduler round-trip
in front of every request). Record counts here are control-plane
sized (keys, links), nowhere near data scale.
"""

from __future__ import annotations

import json
import time
from dataclasses import asdict, dataclass

from pyspark.sql import SparkSession

from .. import fs as hfs


@dataclass
class ShareLink:
    """models.ShareLink (storage/database/models/models.go:16-22)."""

    uuid: str
    destination_id: str
    query: str
    expires_at: float


class ControlStore:
    """JSON-doc control store bound to one warehouse root.

    READ paths (get_*/all_keys) swallow storage errors and report
    not-found: they back in-memory caches, and an unreachable store
    must degrade to cache-only auth, not 500 every request. WRITE
    paths propagate: a key/share that failed to persist must not be
    handed to the caller as durable."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.base = f"{root.rstrip('/')}/_control"

    # -- share links (gorm.go:93-129) ----------------------------------
    def put_share(self, link: ShareLink) -> None:
        hfs.write_text(
            self.spark,
            f"{self.base}/shares/{link.uuid}.json",
            json.dumps(asdict(link), separators=(",", ":")),
        )

    def get_share(self, share_id: str) -> ShareLink | None:
        """Expiry predicate applied at read (gorm.go:112: WHERE
        expires_at > now); expired docs are lazily deleted."""
        path = f"{self.base}/shares/{share_id}.json"
        try:
            if not hfs.exists(self.spark, path):
                return None
            link = ShareLink(**json.loads(hfs.read_text(self.spark, path)))
        except Exception:
            return None
        if link.expires_at <= time.time():
            # lazy delete is best-effort: a storage error here must
            # not turn the expired-share not-found into a 500 (the
            # class contract: read paths swallow storage errors); the
            # doc is re-deleted on the next lookup
            try:
                hfs.delete(self.spark, path, recursive=False)
            except Exception:
                pass
            return None
        return link

    # -- API keys (gorm.go:202-205: hashed-key -> destination) --------
    def put_key(self, key_hash: str, destination_id: str) -> None:
        hfs.write_text(
            self.spark,
            f"{self.base}/keys/{key_hash}.json",
            json.dumps({"destination_id": str(destination_id)}),
        )

    def get_key(self, key_hash: str) -> str | None:
        path = f"{self.base}/keys/{key_hash}.json"
        try:
            if not hfs.exists(self.spark, path):
                return None
            return json.loads(hfs.read_text(self.spark, path))[
                "destination_id"
            ]
        except Exception:
            return None

    def all_keys(self) -> dict[str, str]:
        d = f"{self.base}/keys"
        out: dict[str, str] = {}
        try:
            if not hfs.is_dir(self.spark, d):
                return {}
            for name in hfs.list_names(self.spark, d):
                if name.endswith(".json"):
                    dest = self.get_key(name[:-5])
                    if dest is not None:
                        out[name[:-5]] = dest
        except Exception:
            return out
        return out

    # -- admin key -----------------------------------------------------
    def put_admin(self, key_hash: str) -> None:
        hfs.write_text(
            self.spark,
            f"{self.base}/admin.json",
            json.dumps({"hash": key_hash}),
        )

    def get_admin(self) -> str | None:
        path = f"{self.base}/admin.json"
        try:
            if not hfs.exists(self.spark, path):
                return None
            return json.loads(hfs.read_text(self.spark, path))["hash"]
        except Exception:
            return None
