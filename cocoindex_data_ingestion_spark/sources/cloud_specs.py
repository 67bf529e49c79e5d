"""Cloud source SPECS — AmazonS3 / AzureBlob / GoogleDrive config
objects whose flow-facing surface matches the reference's source
specs, with the cloud *client* isolated behind one seam.

Reference behavior:
- ``cocoindex.sources.AmazonS3(bucket_name, prefix,
  included_patterns, binary, sqs_queue_url)`` —
  src/ops/sources/amazon_s3.rs (list/get over the bucket; SQS queue
  turns the source into a change stream, amazon_s3.rs:180-236).
- ``cocoindex.sources.AzureBlob(account_name, container_name,
  prefix, included_patterns, binary)`` —
  src/ops/sources/azure_blob.rs.
- ``cocoindex.sources.GoogleDrive(service_account_credential_path,
  root_folder_ids, recent_changes_poll_interval)`` —
  src/ops/sources/google_drive.rs (modifiedTime-ordered change
  polling).

Spark mapping: object stores ARE filesystems to Spark — on a real
cluster the spec's ``uri()`` (``s3a://bucket/prefix``,
``abfss://container@account.dfs.core.windows.net/prefix``) goes
straight into the same ``binaryFile`` reader `read_local_files`
uses, with the hadoop-aws / hadoop-azure connector jars supplying
the client; SQS-driven change capture is the file-source stream
(``stream_local_files``) whose listing the cloud notification only
accelerates. Google Drive is not a filesystem; its REST listing
feeds the same PollingSource contract (sources/polling.py). None of
those clients exist in this environment, so ``resolve_path()``
returns ``local_mirror`` when set — THE documented seam: everything
downstream (glob selection, chunk geometry, collectors, export
shape, change capture) is engine-real and tested either way.
"""

from __future__ import annotations

from dataclasses import dataclass, field


def patterns_to_glob(patterns: list[str]) -> str:
    """included_patterns list → one Hadoop ``pathGlobFilter`` value.

    Hadoop's GlobPattern supports ``{a,b}`` alternation, so the
    reference's ``included_patterns=["*.md", "*.txt"]`` becomes
    ``{*.md,*.txt}`` — selection happens at LISTING time (never a
    post-scan filter), which at 100 TB is the difference between
    listing matching keys and reading every object."""
    if not patterns:
        # '{}' (the naive join) is a degenerate glob matching nothing
        # intelligible — fail loudly instead of silently listing zero
        # files (callers wanting everything pass the ['*'] default)
        raise ValueError(
            "patterns_to_glob: empty patterns list (use ['*'] to match"
            " everything)"
        )
    if len(patterns) == 1:
        return patterns[0]
    return "{" + ",".join(patterns) + "}"


@dataclass(frozen=True)
class AmazonS3Spec:
    bucket_name: str
    prefix: str | None = None
    included_patterns: list[str] = field(default_factory=lambda: ["*"])
    binary: bool = False
    sqs_queue_url: str | None = None  # set → change-stream source
    local_mirror: str | None = None  # env seam (no boto3/hadoop-aws here)

    def uri(self) -> str:
        base = f"s3a://{self.bucket_name}"
        return f"{base}/{self.prefix.strip('/')}" if self.prefix else base

    def resolve_path(self) -> str:
        return self.local_mirror if self.local_mirror is not None else self.uri()

    def path_glob(self) -> str:
        return patterns_to_glob(self.included_patterns)


@dataclass(frozen=True)
class AzureBlobSpec:
    account_name: str
    container_name: str
    prefix: str | None = None
    included_patterns: list[str] = field(default_factory=lambda: ["*"])
    binary: bool = False
    local_mirror: str | None = None  # env seam (no hadoop-azure here)

    def uri(self) -> str:
        base = (
            f"abfss://{self.container_name}@{self.account_name}"
            ".dfs.core.windows.net"
        )
        return f"{base}/{self.prefix.strip('/')}" if self.prefix else base

    def resolve_path(self) -> str:
        return self.local_mirror if self.local_mirror is not None else self.uri()

    def path_glob(self) -> str:
        return patterns_to_glob(self.included_patterns)


@dataclass(frozen=True)
class GoogleDriveSpec:
    service_account_credential_path: str
    root_folder_ids: list[str]
    recent_changes_poll_interval_sec: float = 10.0
    local_mirror: str | None = None  # env seam (no Drive REST here)

    def resolve_path(self) -> str:
        """Drive has no URI scheme Spark can mount; the listing comes
        from the REST client (the seam) and feeds PollingSource."""
        if self.local_mirror is not None:
            return self.local_mirror
        raise NotImplementedError(
            "GoogleDrive REST client is environment-blocked; supply "
            "local_mirror or wire a files.list adapter into "
            "PollingSource.list_snapshot"
        )
