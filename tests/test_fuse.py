"""fuse_pandas: fused single-worker kernels == chained mapInPandas.

The round-13 optimization collapsed the codec gates' synth → decode →
reduce mapInPandas chains into ONE mapInPandas (guide §4: one Python
worker per task, no intermediate Arrow crossings of the container
bytes).  These tests pin the contract that makes the rewrite safe:
kernel composition produces the identical row set as the chained
operators, and the extracted kernels keep the operators' kind
filtering.

Kernels are defined inside the tests so cloudpickle ships them by
value (the tests package is not on the executors' import path).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tagminder_spark.session import fuse_pandas


def _make_synth_audio():
    def synth_audio(batches):
        import numpy as np

        from tagminder_spark.sources.multimodal import encode_wav

        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                did = int(r.media_id)
                n = 20 + did % 7
                s = ((did * 7 + np.arange(n) * 13) % 4096 - 2048).astype(
                    "<i2"
                )
                rows.append(
                    {
                        "media_id": did,
                        "kind": "audio",
                        "content": encode_wav(s, 4000),
                        "meta": None,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "content", "meta"]
            )

    return synth_audio


def test_fused_equals_chained_chunk_audio(spark):
    from tagminder_spark.sources.multimodal import (
        AUDIO_CHUNK_SCHEMA,
        MEDIA_SCHEMA,
        chunk_audio,
        chunk_audio_kernel,
    )

    synth_audio = _make_synth_audio()
    d = spark.range(24).select(F.col("id").alias("media_id"))
    chained = chunk_audio(
        d.mapInPandas(synth_audio, MEDIA_SCHEMA), window_ms=3, hop_ms=2
    )
    fused = d.mapInPandas(
        fuse_pandas(synth_audio, chunk_audio_kernel(window_ms=3, hop_ms=2)),
        AUDIO_CHUNK_SCHEMA,
    )
    a = {tuple(r) for r in chained.collect()}
    b = {tuple(r) for r in fused.collect()}
    assert a == b and len(a) > 24  # fan-out actually happened


def test_fused_plan_has_single_python_node(spark):
    from tagminder_spark.sources.multimodal import (
        AUDIO_CHUNK_SCHEMA,
        chunk_audio_kernel,
    )

    d = spark.range(8).select(F.col("id").alias("media_id"))
    fused = d.mapInPandas(
        fuse_pandas(_make_synth_audio(), chunk_audio_kernel()),
        AUDIO_CHUNK_SCHEMA,
    )
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1


def test_kernels_keep_kind_filter(spark):
    """Mixed-kind media through the extracted kernels drops foreign rows
    exactly like the DataFrame operators' kind filters did."""
    from tagminder_spark.sources.multimodal import (
        chunk_audio,
        image_features_kernel,
        synth_media,
    )

    media = synth_media(spark, n=12)  # kinds cycle image/audio/video
    ops = chunk_audio(media, window_ms=100, hop_ms=60).collect()
    assert {r.media_id % 3 for r in ops} == {1}  # audio rows only

    pdf = media.toPandas()
    feats = list(image_features_kernel(dim=8)(iter([pdf])))
    got = pd.concat(feats)
    assert set(got["media_id"] % 3) == {0}  # image rows only


def test_chunk_audio_kernel_validates_params():
    from tagminder_spark.sources.multimodal import chunk_audio_kernel

    with pytest.raises(ValueError):
        chunk_audio_kernel(window_ms=0)
    with pytest.raises(ValueError):
        chunk_audio_kernel(hop_ms=0)
    with pytest.raises(ValueError):
        chunk_audio_kernel(ms_per_byte=-1)
