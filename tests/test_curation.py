"""curate_corpus edge cases: empty text, all-filtered input, duplicate
content first-wins, and threshold plumbing."""

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data

from entitylinking_ray.pipelines.curation import curate_corpus


@pytest.mark.usefixtures("ray_session")
def test_curate_dedup_first_wins_and_filters():
    long_en = " ".join(
        ["the of and to in is was for on with that"] * 3
    )  # 33 tokens, english markers, distinct-ish enough
    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                long_en,            # kept (first copy)
                long_en,            # dup -> dropped (first wins)
                "  " + long_en,     # same normalized content -> dropped
                "short text",       # < min_tokens
                "",                 # empty
                "x y z " * 8,       # 24 tokens but 'und' language
            ],
        }
    )
    out = (
        curate_corpus(
            ray.data.from_pandas(df).repartition(3),
            min_quality=0.0,
            min_tokens=10,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [0]
    assert out.loc[0, "lang_pred"] == "en"
    assert out.loc[0, "n_tokens"] == 33


@pytest.mark.usefixtures("ray_session")
def test_curate_all_filtered_is_empty_not_error():
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["a", ""]})
    out = curate_corpus(ray.data.from_pandas(df)).to_pandas()
    assert len(out) == 0
