"""Post-write artifact hook (K6 analog).

The reference uploads each written CSV to IPFS via the Pinata API
right after the write (services/pinata_uploader.py:10-159).  This
sandbox has no network, so the engine ships the *hook* for real and
two uploaders:

* :class:`LocalCASUploader` — a content-addressed artifact store on
  local disk: the artifact is copied to ``<store>/<cid>`` where the
  cid is derived from the file bytes (sha256, the same
  content-addressing property an IPFS CID gives).  Re-uploading
  identical bytes is a no-op returning the same cid — pin-once
  semantics.
* :class:`PinataUploader` — the real-network path, honestly stubbed:
  constructing it works (so wiring can be tested), calling it raises
  ``NotImplementedError`` until credentials + network exist.
"""

from __future__ import annotations

import hashlib
import os
import shutil


class LocalCASUploader:
    """Content-addressed local artifact store (the deterministic
    stand-in for pin-to-IPFS)."""

    def __init__(self, store_dir: str):
        self.store_dir = store_dir
        os.makedirs(store_dir, exist_ok=True)

    @staticmethod
    def content_id(path: str) -> str:
        h = hashlib.sha256()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        return f"cas-{h.hexdigest()}"

    def upload(self, path: str) -> dict:
        """Pin one file; idempotent on content.  Returns the receipt
        the reference's uploader returns ({IpfsHash, PinSize, name},
        services/pinata_uploader.py response shape)."""
        cid = self.content_id(path)
        dest = os.path.join(self.store_dir, cid)
        already = os.path.exists(dest)
        if not already:
            tmp = dest + ".tmp"
            shutil.copyfile(path, tmp)
            os.replace(tmp, dest)  # atomic: no torn artifacts
        return {
            "cid": cid,
            "size": os.path.getsize(dest),
            "name": os.path.basename(path),
            "deduplicated": already,
        }


class PinataUploader:  # pragma: no cover - network path
    """Real IPFS pinning via the Pinata HTTP API — requires network
    and credentials, neither of which exists in this environment."""

    def __init__(self, api_key: str | None = None, api_secret: str | None = None):
        self.api_key = api_key
        self.api_secret = api_secret

    def upload(self, path: str) -> dict:
        raise NotImplementedError(
            "network IPFS pinning is unavailable in this environment; "
            "use LocalCASUploader, or implement the Pinata POST here "
            "(reference: services/pinata_uploader.py:10-159)"
        )


def post_write_upload(paths: list[str], uploader) -> list[dict]:
    """The post-write hook: pin every written artifact, returning the
    receipts (reference: main.py calls the uploader right after
    write_csv)."""
    return [uploader.upload(p) for p in paths]
