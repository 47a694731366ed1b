"""Smoke tests: the example walkthroughs must run end-to-end (examples rot
silently otherwise).  Each runs as a subprocess with its own Spark session.
``label_cleaning.py`` trains a 4-model ensemble (~2-3 min) and is gated
behind RUN_SLOW_EXAMPLES=1 to keep the suite fast."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _run(name, timeout):
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", name)],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=ROOT,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def test_person_names_example():
    out = _run("person_names.py", 180)
    assert "person" in out.lower() or len(out) > 0


def test_corpus_prep_example():
    out = _run("corpus_prep.py", 300)
    assert "split" in out.lower() or "funnel" in out.lower() or len(out) > 0


def test_streaming_pipeline_example():
    _run("streaming_pipeline.py", 300)


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW_EXAMPLES"),
    reason="trains a model ensemble (~2-3 min); set RUN_SLOW_EXAMPLES=1",
)
def test_label_cleaning_example():
    out = _run("label_cleaning.py", 600)
    assert "per-model F1 report" in out


def test_crawl_prep_example():
    out = _run("crawl_prep.py", 300)
    assert "OK crawl front end-to-end" in out


def test_tokenizer_training_example():
    out = _run("tokenizer_training.py", 300)
    assert "learned" in out and "chars_per_subtoken" in out


def test_ann_search_example():
    out = _run("ann_search.py", 600)
    assert "OK" in out and "recall@10" in out
