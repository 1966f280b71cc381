"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The multimodal-columns north star (BASELINE.json): image/audio/video
travel as ``BinaryType`` columns with typed metadata beside them;
decode / feature-extract run as Arrow-batched ``mapInPandas`` stages.

The actual media codecs are NOT in this container, so ``decode_media``
is a clearly-marked stub (NotImplementedError), and the pipeline ships
a deterministic fake featurizer instead — the Spark-side contract
(schema, batch iteration, partition behavior) is real and tested.

Scale: mapInPandas streams Arrow batches through Python — constant
memory per task regardless of partition size; binary payloads never
pass through a shuffle in this pipeline (features are extracted before
any wide operation).
"""

from __future__ import annotations

MEDIA_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, byte_sum long, head_hex string"
)
# The featurizer itself lives as a closure inside
# operators/llm.py::multimodal_features — shipped UDFs must be
# closure-serialized, so a module-level copy here would be dead code
# that drifts from the one actually executed.


def decode_media(payload: bytes, media_type: str):
    """Decode an image/audio/video payload into frames/samples.

    STUB: real decoding needs codec libraries (Pillow/ffmpeg/librosa)
    that are not available in this environment. The surrounding Spark
    plumbing is real; swap this function for a real decoder to light up
    media support.
    """
    raise NotImplementedError(
        f"media decoding for {media_type!r} requires codec libraries; "
        "this build ships the Spark plumbing with a deterministic fake "
        "featurizer (see fake_features_batches)"
    )


