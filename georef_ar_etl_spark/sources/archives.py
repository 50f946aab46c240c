"""Archive extraction: the reference's ExtractZipStep / ExtractTarStep
(georef_ar_etl/transformers.py:10-56) — driver-side unpack, not a dataflow
op. Same semantics: the destination directory is removed first if present
(stale partial extractions never leak into a re-run), and the extracted
directory path flows to the next step.

Safety the reference predates: member paths are validated against
directory traversal (``..`` or absolute paths) before extraction.
"""

from __future__ import annotations

import os
import shutil
import tarfile
import zipfile


class ArchiveError(ValueError):
    """Unsupported archive type or unsafe member path."""


def _check_member(dest_dir: str, name: str) -> None:
    base = os.path.realpath(dest_dir)
    target = os.path.realpath(os.path.join(dest_dir, name))
    # allow the destination itself: GNU tar archives legitimately carry
    # '.'/'./' directory entries
    if target != base and not target.startswith(base + os.sep):
        raise ArchiveError(f"unsafe archive member path: {name!r}")


def extract_archive(path: str, dest_dir: str | None = None) -> str:
    """Unpack ``path`` (zip / tar[.gz|.bz2]) into ``dest_dir`` (default:
    archive path minus its extension), removing a stale destination first.
    Returns the destination directory."""
    if dest_dir is None:
        base = path
        for ext in (".tar.gz", ".tar.bz2", ".tgz", ".tar", ".zip"):
            if base.endswith(ext):
                base = base[: -len(ext)]
                break
        dest_dir = base + ".d"
    if os.path.isdir(dest_dir):
        shutil.rmtree(dest_dir)  # reference: remove stale dir first
    os.makedirs(dest_dir)

    if zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as z:
            for name in z.namelist():
                _check_member(dest_dir, name)
            z.extractall(dest_dir)
    elif tarfile.is_tarfile(path):
        with tarfile.open(path) as t:
            for m in t.getmembers():
                _check_member(dest_dir, m.name)
                # the name check alone is NOT enough for tar: a symlink
                # member pointing outside dest followed by a member path
                # THROUGH the link escapes (realpath of a not-yet-created
                # link resolves to nothing) — reject link members whose
                # target leaves the destination. SYMlink targets resolve
                # relative to the link's own directory; HARDlink targets
                # resolve from the extraction root (tarfile semantics).
                if m.issym() or m.islnk():
                    if os.path.isabs(m.linkname):
                        rel_target = m.linkname
                    elif m.issym():
                        rel_target = os.path.join(
                            os.path.dirname(m.name), m.linkname
                        )
                    else:
                        rel_target = m.linkname
                    _check_member(dest_dir, rel_target)
            # Python 3.11.4+: the 'data' filter enforces the same class of
            # constraints at extraction time (defense in depth); map its
            # rejections onto this module's contract exception
            try:
                t.extractall(dest_dir, filter="data")
            except tarfile.TarError as exc:
                raise ArchiveError(f"unsafe or unreadable tar member: {exc}") from exc
    else:
        raise ArchiveError(f"not a zip or tar archive: {path}")
    return dest_dir
