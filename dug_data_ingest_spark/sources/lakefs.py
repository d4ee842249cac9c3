"""Minimal LakeFS commit client — the post-write half of the
snk-object-store story.

The reference syncs each program directory into a LakeFS branch and
then commits via the REST API:
``POST {host}/api/v1/repositories/{repo}/branches/{branch}/commits``
with basic auth and a JSON message (scripts/bdc/ingest.sh:85-100).
Here the Spark writer lands the partitioned parquet (the rclone-sync
analogue) and ``commit_hook`` makes that same REST call afterwards —
write THEN commit, so a failed write never publishes a version.

Re-runs are idempotent at the version level: re-writing identical
content and committing again yields LakeFS's "no changes" error,
which ``commit`` treats as success by default (the branch already
holds exactly this state), mirroring how a re-run of ingest.sh is a
no-op sync + empty commit.
"""

from __future__ import annotations

import json


class LakeFSClient:
    """Tiny REST client for the one call the ingest needs. Auth is
    HTTP basic (the reference's ``curl -u user:pass``)."""

    def __init__(
        self,
        host: str,
        username: str,
        password: str,
        *,
        timeout: float = 60,
    ) -> None:
        self.host = host.rstrip("/")
        self.auth = (username, password)
        self.timeout = timeout

    def commit(
        self,
        repository: str,
        branch: str,
        message: str,
        metadata: dict | None = None,
        ignore_empty: bool = True,
    ) -> dict:
        """Create a commit on ``branch``; returns the commit record.

        A "no changes" rejection (re-run of an identical write) is
        returned as ``{"empty": True}`` instead of raising when
        ``ignore_empty`` — the branch state already matches.
        """
        import requests

        url = (
            f"{self.host}/api/v1/repositories/{repository}"
            f"/branches/{branch}/commits"
        )
        body: dict = {"message": message}
        if metadata:
            body["metadata"] = {k: str(v) for k, v in metadata.items()}
        resp = requests.post(
            url,
            auth=self.auth,
            headers={"Content-Type": "application/json"},
            data=json.dumps(body),
            timeout=self.timeout,
        )
        if resp.ok:
            return resp.json()
        # Only LakeFS's specific empty-commit rejection (HTTP 400,
        # "commit: no changes") counts as the idempotent-re-run case;
        # a 5xx that happens to mention "no changes" is still a failure.
        if ignore_empty and resp.status_code == 400 and "no changes" in resp.text:
            return {"empty": True}
        raise RuntimeError(
            f"LakeFS commit to {repository}/{branch} failed: "
            f"{resp.status_code} {resp.text[:500]}"
        )


def lakefs_commit_hook(
    client: LakeFSClient, repository: str, branch: str, message: str
):
    """``commit_hook`` for ``files.write_partitioned``: commits the
    branch after the parquet lands, tagging the commit with the
    written path so the version history records what was published
    (the reference bakes the date into its message the same way,
    ingest.sh:97-99)."""

    def hook(path: str) -> dict:
        return client.commit(
            repository, branch, message, metadata={"path": path}
        )

    return hook


def lakefs_delta_commit_hook(
    client: LakeFSClient, repository: str, branch: str, message: str
):
    """``commit_hook`` for ``delta_sync.delta_sync_write``: same
    commit, but the sync stats ride the commit metadata so the version
    history records WHAT changed (uploads/renames/deletes) — the
    rclone-sync log line, persisted. delta_sync_write only calls this
    on a non-empty sync, so unchanged re-runs publish nothing (LakeFS
    never even sees an empty commit)."""

    def hook(path: str, stats: dict) -> dict:
        meta = {"path": path}
        meta.update({k: str(v) for k, v in stats.items()})
        return client.commit(repository, branch, message, metadata=meta)

    return hook
