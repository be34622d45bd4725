"""Regression pins for the bounded materializations in the no-broadcast
prepare-corpus path (VERDICT r4 #7).

The round-4 bug being pinned: ``contamination_hits_join``'s bench-gram
table and ``prepare_corpus_packed``'s hits/survivor intermediates are
each consumed by TWO downstream stages; without their ``materialize()``
calls the lazy producing pipelines re-execute per consumer (measured
31 s instead of 7 s at sf0.1). The pins count ACTUAL executions through
a side-effect file written from inside the UDF tasks: every input row id
is appended once per pass over the input, so the per-id multiplicity is
exactly the number of times the producing pipeline ran — independent of
batch boundaries, block counts, and scheduling.
"""

import os
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from entitylinking_ray.stages.hygiene import (
    _mod_bench,
    contamination_hits,
    contamination_hits_join,
    prepare_corpus_packed,
)


def _counting_stage(log_path: str):
    """map_batches UDF that logs every row id it sees (O_APPEND lines are
    atomic for these short writes on one node) and passes rows through."""

    def log_rows(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        with open(log_path, "a") as f:
            f.write("".join(f"{i}\n" for i in ids))
        return b

    return log_rows


def _multiplicities(log_path: str) -> set[int]:
    with open(log_path) as f:
        counts = pd.Series([ln.strip() for ln in f if ln.strip()]).value_counts()
    return set(int(c) for c in counts.to_numpy())


def _docs(n: int, start: int = 0) -> ray.data.Dataset:
    rng = np.random.default_rng(7)
    # English stopwords so lang_id classifies "en" (curate's lang filter)
    words = ["the", "and", "of", "to", "in", "that", "is", "was", "for"]
    texts = [
        " ".join(rng.choice(words, size=12).tolist()) for _ in range(n)
    ]
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(start, start + n), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_bench_gram_pass_executes_once(ray_session, tmp_path):
    """The bench-gram producing pass must run EXACTLY once even though
    the bloom build and the exact verify both consume the bench-gram
    table — removing the materialize in contamination_hits_join makes
    every bench row id appear >= 2 times in the log and fails here."""
    log = str(tmp_path / f"bench_{uuid.uuid4().hex}.log")
    bench = _docs(40).map_batches(_counting_stage(log), batch_format="pyarrow")
    corpus = _docs(300, start=1000)
    hits = contamination_hits_join(
        corpus, 3, _mod_bench(10**9), bench_ds=bench
    ).materialize()
    assert hits.count() >= 0  # force execution (materialize above did)
    assert os.path.exists(log)
    assert _multiplicities(log) == {1}, (
        "bench-gram producing pipeline executed more than once — the "
        "bounded materialize in contamination_hits_join was removed?"
    )


def test_prepare_corpus_join_path_passes_are_bounded(ray_session, tmp_path):
    """Full prepare_corpus_packed on the distributed path (bloom hits +
    bloom anti-join drop forced via the two size switches): the corpus
    input is consumed exactly TWICE (curation pass + corpus-gram pass)
    and the bench input exactly ONCE. Removing the hits materialize or
    the survivor-keys materialize re-executes a producing pipeline and
    raises a multiplicity above the pin."""
    corpus_log = str(tmp_path / f"corpus_{uuid.uuid4().hex}.log")
    bench_log = str(tmp_path / f"benchp_{uuid.uuid4().hex}.log")
    corpus = _docs(300).map_batches(
        _counting_stage(corpus_log), batch_format="pyarrow"
    )
    bench = _docs(40, start=1000).map_batches(
        _counting_stage(bench_log), batch_format="pyarrow"
    )
    out = prepare_corpus_packed(
        corpus,
        min_quality=-1.0,
        min_tokens=1,
        bench_ds=bench,
        broadcast_max_docs=0,       # force the distributed bench-gram path
        drop_broadcast_max_ids=0,   # force the bloom anti-join drop
    ).materialize()
    assert out.count() > 0
    # three passes, measured on the good code: curation, corpus grams,
    # and semi_join_bloom's left.schema() peek (a full pass here because
    # the test input is one block). Removing the hits materialize pushes
    # this to >= 5 (hits' two-plus consumers re-run the gram pipeline);
    # removing the survivor-keys materialize adds curate re-runs.
    assert _multiplicities(corpus_log) == {3}, (
        "corpus consumed a different number of times than the pinned "
        "three passes — a bounded materialize in prepare_corpus_packed/"
        "contamination_hits_join was removed?"
    )
    assert _multiplicities(bench_log) == {1}


def test_join_path_equals_broadcast_path_rows(ray_session):
    """Sanity companion: the two decontamination paths stay row-identical
    on the same input (the equality the materializes must not break)."""
    corpus = _docs(200)
    bench = _docs(30, start=1000)
    a = contamination_hits(
        corpus, 3, _mod_bench(10**9), bench_ds=bench
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = contamination_hits_join(
        corpus, 3, _mod_bench(10**9), bench_ds=bench
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
