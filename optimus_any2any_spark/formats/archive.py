"""Post-commit archiving (reference: internal/ext/archive/
file_archiver.go:37-53 — gz per file; zip and tar.gz archive *many
files into one* placed at the nearest common parent dir
(write_handler.go:352-407, NearestCommonParentDir util.go:307-317);
``auto`` mode picks the type from each destination's extra extension
(SplitExtension util.go:319-333)).

gzip-per-file is native in the sink (Spark writer compression); this
module covers the many-files-into-one-archive step, which is inherently
a driver-side post-commit action over the committed outputs.
AES-password zip (yeka/zip's AES256Encryption in the reference) is
provided by :mod:`optimus_any2any_spark.formats.zipsec`, a pure-stdlib
WinZip-AES/ZipCrypto writer.
"""

from __future__ import annotations

import gzip
import os
import shutil
import tarfile
import zipfile


def nearest_common_parent(paths: list[str]) -> str:
    """NearestCommonParentDir (internal/ext/fs/util.go:307-317)."""
    if not paths:
        return "."
    common = os.path.commonpath([os.path.abspath(p) for p in paths])
    if os.path.isfile(common):
        common = os.path.dirname(common)
    return common


def split_archive_extension(path: str) -> tuple[str, str | None]:
    """SplitExtension (util.go:319-333): 'auto' mode — the destination's
    extra extension names the archive type. Returns (inner_path, type)."""
    lower = path.lower()
    if lower.endswith(".tar.gz"):
        return path[: -len(".tar.gz")], "tar.gz"
    for ext, kind in ((".gz", "gz"), (".zip", "zip")):
        if lower.endswith(ext):
            return path[: -len(ext)], kind
    return path, None


def archive_files(
    files: list[str],
    archive_type: str,
    archive_path: str | None = None,
    password: str | None = None,
    remove_sources: bool = True,
) -> str:
    """Archive committed output files into one archive at the nearest
    common parent dir (default), mirroring the reference's layout."""
    if not files:
        raise ValueError("no files to archive")
    parent = nearest_common_parent(files)
    if archive_path is None:
        base = os.path.basename(files[0])
        archive_path = os.path.join(parent, base + "." + archive_type)

    if archive_type in ("gz", "gzip"):
        if len(files) != 1:
            raise ValueError("gz compresses a single file; use tar.gz for many")
        with open(files[0], "rb") as src, gzip.open(archive_path, "wb") as dst:
            shutil.copyfileobj(src, dst)
    elif archive_type == "tar.gz":
        with tarfile.open(archive_path, "w:gz") as tar:
            for f in files:
                tar.add(f, arcname=os.path.relpath(f, parent))
    elif archive_type == "zip":
        if password:
            # WinZip AES-256 like the reference (file_archiver.go:203
            # zip.AES256Encryption) — pure-stdlib implementation.
            from optimus_any2any_spark.formats.zipsec import write_encrypted_zip

            entries = [
                (os.path.relpath(f, parent), open(f, "rb").read()) for f in files
            ]
            write_encrypted_zip(archive_path, entries, password, "aes256")
        else:
            with zipfile.ZipFile(archive_path, "w", zipfile.ZIP_DEFLATED) as z:
                for f in files:
                    z.write(f, arcname=os.path.relpath(f, parent))
    else:
        raise ValueError(f"unknown archive type: {archive_type}")

    if remove_sources:
        for f in files:
            os.remove(f)
    return archive_path
