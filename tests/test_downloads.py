"""Downloader surface (reference io/conll.py:1326-1421) — exercised fully
offline through file:// URLs, which urllib serves from the local
filesystem: the cache / zip / fold-map logic is identical to the network
path."""

import os
import zipfile

import pytest

from text_extensions_for_pandas_spark.sources.downloads import (
    maybe_download_conll_data,
    maybe_download_dataset_data,
    maybe_download_file,
)


def _url(path) -> str:
    return f"file://{path}"


def test_maybe_download_file_fetches_and_caches(tmp_path):
    src = tmp_path / "src" / "hello.txt"
    src.parent.mkdir()
    src.write_text("payload-1")
    tgt = tmp_path / "cache"

    got = maybe_download_file(_url(src), str(tgt))
    assert got == str(tgt / "hello.txt")
    assert open(got).read() == "payload-1"

    # cache-first: a second call must NOT refetch (mutate source to prove it)
    src.write_text("payload-2")
    again = maybe_download_file(_url(src), str(tgt))
    assert again == got and open(again).read() == "payload-1"


def test_maybe_download_file_rejects_odd_schemes(tmp_path):
    with pytest.raises(ValueError, match="scheme"):
        maybe_download_file("ftp://example.com/x.txt", str(tmp_path))


def test_maybe_download_conll_data_fold_map(tmp_path):
    base = tmp_path / "mirror"
    base.mkdir()
    for fname in ("eng.train", "eng.testa", "eng.testb"):
        (base / fname).write_text(f"-DOCSTART- -X- -X- O\n\n{fname}")
    folds = maybe_download_conll_data(str(tmp_path / "corpus"), base_url=_url(base))
    assert set(folds) == {"train", "dev", "test"}
    assert folds["dev"].endswith("eng.testa")
    assert all(os.path.exists(p) for p in folds.values())


def test_maybe_download_dataset_data_plain_and_named(tmp_path):
    src = tmp_path / "data.json"
    src.write_text("{}")
    out = maybe_download_dataset_data(str(tmp_path / "d1"), _url(src))
    assert out == str(tmp_path / "d1" / "data.json")
    out2 = maybe_download_dataset_data(str(tmp_path / "d2"), _url(src), fname="alt.json")
    assert out2 == str(tmp_path / "d2" / "alt.json") and os.path.exists(out2)


def test_maybe_download_dataset_data_zip(tmp_path):
    zpath = tmp_path / "bundle.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("a.txt", "A")
        z.writestr("sub/b.txt", "B")
    tgt = tmp_path / "out"
    got = maybe_download_dataset_data(str(tgt), _url(zpath))
    assert sorted(os.path.basename(p) for p in got) == ["a.txt", "b.txt"]
    assert open(tgt / "sub" / "b.txt").read() == "B"
    # single-member request returns that member's path
    one = maybe_download_dataset_data(str(tgt), _url(zpath), fname="a.txt")
    assert one == str(tgt / "a.txt")


def test_maybe_download_dataset_data_zip_single_member(tmp_path):
    zpath = tmp_path / "single.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("only.csv", "x,y\n1,2\n")
    got = maybe_download_dataset_data(str(tmp_path / "out1"), _url(zpath))
    assert got == str(tmp_path / "out1" / "only.csv")


def test_zip_slip_rejected(tmp_path):
    zpath = tmp_path / "evil.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("../escape.txt", "evil")
    with pytest.raises(ValueError, match="escapes"):
        maybe_download_dataset_data(str(tmp_path / "out2"), _url(zpath))
    assert not os.path.exists(tmp_path / "escape.txt")


def test_reference_namespace_exposes_downloaders():
    from text_extensions_for_pandas_spark.io import conll as io_conll

    assert io_conll.maybe_download_conll_data is maybe_download_conll_data
    assert io_conll.maybe_download_dataset_data is maybe_download_dataset_data
