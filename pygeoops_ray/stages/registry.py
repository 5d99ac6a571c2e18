"""Stage protocol + pipeline builder: the engine's user-extension surface.

The reference's extension model is plain functions with a duck-typed
array-in/array-out convention plus string dispatch (``_simplify.py:162-175``
``algorithm=``); the Ray-native re-expression is a named batch transform —
``(pa.Table) -> pa.Table`` — with DECLARED input/output columns, registered
once and composed into a ``Dataset`` pipeline:

    from pygeoops_ray.stages.registry import apply_stages
    ds = apply_stages(ds, "token_count")              # built-in
    register(Stage("my_op", fn, ["text"], ["score"]))  # custom kernel
    ds = apply_stages(ds, "my_op")

``apply_stages`` validates each stage's input columns against the dataset
schema BEFORE execution (a missing column fails at plan time, not minutes
into a 100-TB run) and chains ``map_batches`` stages, which Ray's optimizer
fuses with the read and with each other. Actor-pool stages (a callable
CLASS) pass ``concurrency`` through so stateful setup happens once per
worker.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Callable

__all__ = ["Stage", "register", "get_stage", "list_stages", "apply_stages"]


@dataclass(frozen=True)
class Stage:
    """A named batch transform with a declared column contract.

    ``fn`` is either a function ``(pa.Table) -> pa.Table`` (stateless task
    pool) or a callable class (actor pool — per-worker state built once in
    ``__init__``). ``input_cols`` must exist in the input schema;
    ``output_cols`` documents what the stage guarantees to emit (checked in
    tests, advisory at plan time since map_batches output schemas are lazy).
    """

    name: str
    fn: Callable
    input_cols: tuple[str, ...]
    output_cols: tuple[str, ...]
    batch_size: int | None = None
    kwargs: dict = field(default_factory=dict)

    @property
    def is_actor(self) -> bool:
        return inspect.isclass(self.fn)


_REGISTRY: dict[str, Stage] = {}


def register(stage: Stage, replace: bool = False) -> Stage:
    if not replace and stage.name in _REGISTRY:
        raise ValueError(f"stage already registered: {stage.name!r}")
    _REGISTRY[stage.name] = stage
    return stage


def get_stage(name: str) -> Stage:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown stage {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def list_stages() -> list[str]:
    return sorted(_REGISTRY)


def apply_stages(ds, *names: str, concurrency: int | None = None):
    """Chain registered stages onto a Dataset with plan-time column checks.

    Column availability is tracked through the chain: a stage may consume
    columns emitted by an earlier stage in the same call. Schema inspection
    uses the dataset's lazy schema (metadata-only for parquet reads).
    """
    available = set(ds.schema().names)
    for name in names:
        st = get_stage(name)
        missing = [c for c in st.input_cols if c not in available]
        if missing:
            raise ValueError(
                f"stage {name!r} needs column(s) {missing} but the pipeline "
                f"provides {sorted(available)}"
            )
        kw = dict(st.kwargs)
        if st.is_actor:
            kw.setdefault("concurrency", concurrency or 2)
        ds = ds.map_batches(
            st.fn, batch_format="pyarrow", batch_size=st.batch_size, **kw
        )
        # conservative: assume column-replacing stages (from_pydict outputs)
        # only guarantee their declared outputs plus declared passthroughs
        available = set(st.output_cols)
    return ds


def _register_builtins() -> None:
    from pygeoops_ray.stages import multimodal as mm
    from pygeoops_ray.stages import text as tx
    from pygeoops_ray.stages.dedup import minhash_signatures_batch, simhash_batch
    from pygeoops_ray.stages.sketch import hll_tokens_batch as _hll_tokens_batch

    for st in (
        Stage("token_count", tx.token_count_batch, ("doc_id", "text"), ("doc_id", "n_tokens")),
        Stage(
            "text_quality",
            tx.quality_batch,
            ("doc_id", "text"),
            ("doc_id", "n_chars_calc", "n_spaces", "n_tokens", "avg_token_len"),
        ),
        Stage("lang_id", tx.LangId, ("doc_id", "text"), ("doc_id", "lang_pred")),
        Stage("fingerprint", tx.fingerprint_batch, ("doc_id", "text"), ("doc_id", "fp")),
        Stage("winnow_fp", tx.winnow_batch, ("doc_id", "text"), ("doc_id", "fp_key")),
        Stage(
            "minhash_bands",
            minhash_signatures_batch,
            ("doc_id", "text"),
            ("doc_id", "band_id", "band_hash"),
        ),
        Stage("simhash", simhash_batch, ("doc_id", "text"), ("doc_id", "simhash")),
        Stage("hll_partial", _hll_tokens_batch, ("text",), ("bucket", "r")),
        Stage(
            "quantized_digest",
            mm.quantized_digest_batch,
            ("image_id", "bytes", "fmt"),
            ("image_id", "bytes", "fmt", "qdigest", "phash_q"),
            batch_size=1024,
        ),
        Stage(
            "int_hash",
            mm.int_hash_batch,
            ("image_id", "bytes", "fmt"),
            ("image_id", "ihash"),
            batch_size=1024,
        ),
        Stage(
            "image_pyramid",
            mm.pyramid_batch,
            ("image_id", "bytes", "fmt"),
            ("image_id", "level", "w", "h", "bytes", "sum_rgb", "sum_sq", "pyramid_ok"),
            batch_size=1024,
        ),
        Stage(
            "zonal_partial",
            mm.zonal_partial_batch,
            ("bytes", "fmt", "minx", "miny"),
            ("zone_x", "zone_y", "sum_gray", "n_px"),
            batch_size=1024,
        ),
        Stage(
            "audio_features",
            mm.AudioFeatureStage,
            ("clip_id", "bytes"),
            ("clip_id", "n_samples", "sum_abs", "energy", "max_abs", "zero_crossings"),
            batch_size=256,
        ),
        Stage(
            "audio_resample",
            mm.AudioResampleStage,
            ("clip_id", "bytes", "n", "rate", "fmt"),
            ("clip_id", "fmt", "bytes", "n", "rate"),
            batch_size=256,
        ),
        Stage(
            "frame_sample",
            mm.FrameSampleStage,
            ("video_id", "bytes", "fmt"),
            ("video_id", "frame_idx", "bytes", "w", "h", "fmt"),
            batch_size=64,
        ),
    ):
        register(st)


_register_builtins()
