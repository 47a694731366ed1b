"""Corpus download-and-cache helpers.

Re-expresses the reference's downloader surface (reference
``io/conll.py:1326-1421``: ``maybe_download_conll_data``,
``maybe_download_dataset_data``) on the standard library.  The semantics
are cache-first: if the target file already exists nothing is fetched, so
in an offline environment (such as this sandbox) users stage the files by
any means and every call is a no-op path lookup.  URLs are fetched with
``urllib`` — which also accepts ``file://`` URLs, letting the cache/zip
logic be exercised without network.

Two deliberate hardening changes vs the reference:

* zip extraction refuses entries that would escape ``target_dir``
  (zip-slip), where the reference extracts blindly;
* only ``http(s)://`` and ``file://`` schemes are accepted.
"""

from __future__ import annotations

import os
import shutil
import urllib.parse
import warnings
import urllib.request
from zipfile import ZipFile

__all__ = [
    "maybe_download_conll_data",
    "maybe_download_dataset_data",
    "maybe_download_file",
]

_ALLOWED_SCHEMES = ("http", "https", "file")

# reference io/conll.py:1340-1348 — the CoNLL-2003 mirror it fetches from.
_CONLL_DOWNLOAD_BASE_URL = (
    "https://github.com/patverga/torch-ner-nlp-from-scratch/raw/master/"
    "data/conll2003/"
)
_CONLL_FOLD_FILES = {"train": "eng.train", "dev": "eng.testa", "test": "eng.testb"}


def _fetch(url: str, destination: str) -> None:
    scheme = urllib.parse.urlparse(url).scheme
    if scheme not in _ALLOWED_SCHEMES:
        raise ValueError(f"refusing URL scheme {scheme!r} (allowed: {_ALLOWED_SCHEMES})")
    # stream to disk: dataset archives are multi-GB, never buffer them whole
    with urllib.request.urlopen(url) as resp:  # noqa: S310 - scheme checked above
        with open(destination, "wb") as f:
            shutil.copyfileobj(resp, f)


def _url_filename(url: str) -> str:
    """Basename of the URL's PATH — query strings / fragments excluded, so
    'https://host/data.zip?raw=true' names (and extension-tests as)
    'data.zip'."""
    return urllib.parse.urlparse(url).path.rsplit("/", 1)[-1]


def maybe_download_file(url: str, target_dir: str, fname: str | None = None) -> str:
    """Fetch ``url`` into ``target_dir`` unless the file is already there;
    return its path.  The cache-first contract of the reference's
    downloaders (reference ``io/conll.py:1353-1361``) as a reusable
    primitive."""
    os.makedirs(target_dir, exist_ok=True)
    file_name = fname if fname is not None else _url_filename(url)
    full_path = os.path.join(target_dir, file_name)
    if not os.path.exists(full_path):
        _fetch(url, full_path)
    return full_path


def maybe_download_conll_data(
    target_dir: str, base_url: str = _CONLL_DOWNLOAD_BASE_URL
) -> dict[str, str]:
    """Download and cache the CoNLL-2003 NER corpus (reference
    ``io/conll.py:1326-1361``), returning ``{fold: path}`` for the
    ``train``/``dev``/``test`` folds.

    **The data set is licensed for research use only** — the reference's
    license note applies unchanged.  ``base_url`` may be any http(s) or
    ``file://`` prefix holding ``eng.train``/``eng.testa``/``eng.testb``;
    files already present under ``target_dir`` are never re-fetched, so a
    pre-staged directory works fully offline.
    """
    if not base_url.endswith("/"):
        base_url += "/"
    return {
        fold: maybe_download_file(base_url + fname, target_dir, fname)
        for fold, fname in _CONLL_FOLD_FILES.items()
    }


def maybe_download_dataset_data(
    target_dir: str, document_url: str, fname: str | None = None
) -> str | list[str]:
    """Cache-first fetch of a dataset file or zip archive (reference
    ``io/conll.py:1364-1421``).

    Plain files: download to ``target_dir`` (named ``fname`` or the URL's
    basename) unless present; return the path.  ``*.zip`` URLs: download
    the archive once, then extract — only ``fname`` when given and found
    in the archive, else every member not already extracted.  Returns the
    single member's path for one-file archives (or when ``fname`` hit),
    else the list of member paths, matching the reference's shape.
    """
    os.makedirs(target_dir, exist_ok=True)
    file_name = fname if fname is not None else _url_filename(document_url)
    full_path = os.path.join(target_dir, file_name)

    if _url_filename(document_url).rsplit(".", 1)[-1] == "zip" and (
        fname is None or not os.path.exists(full_path)
    ):
        zip_path = maybe_download_file(document_url, target_dir)
        with ZipFile(zip_path, "r") as zipf:
            names = zipf.namelist()
            root = os.path.realpath(target_dir)
            for member in names:
                dest = os.path.realpath(os.path.join(target_dir, member))
                if os.path.commonpath([root, dest]) != root:
                    raise ValueError(f"zip entry escapes target_dir: {member!r}")
            if fname is not None and fname in names:
                zipf.extract(fname, target_dir)
                return full_path
            if fname is not None:
                # the documented contract is "return full_path when fname
                # hit"; falling through to extract-everything is the
                # reference's behavior but surprises callers, so say so
                warnings.warn(
                    f"maybe_download_dataset_data: {fname!r} not found in "
                    f"{document_url!r} (members: {names[:5]}...); extracting "
                    "all members and returning the member-list shape instead",
                    stacklevel=2,
                )
            for member in names:
                if not os.path.exists(os.path.join(target_dir, member)):
                    zipf.extract(member, target_dir)
        if len(names) == 1:
            return os.path.join(target_dir, names[0])
        return [os.path.join(target_dir, member) for member in names]

    if not os.path.exists(full_path):
        _fetch(document_url, full_path)
    return full_path
