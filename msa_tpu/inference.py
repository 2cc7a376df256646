"""Batched inference / serving API.

The reference's only inference path is sampling.py's batch-size-1 loop over
the test set (ref sampling.py:314-330, crashed by signature drift).  This
module is the production path: load a checkpoint once, jit once, then serve
fixed-shape batches (ragged inputs are padded to the compiled batch size and
the padding is dropped from the outputs).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from .configs import ExperimentConfig
from .data.featurize import FeaturizedSplit
from .models.mmbert import init_mmbert_params, mmbert_forward
from .parallel.mesh import make_mesh
from .parallel.sharding import param_shardings
from .training.checkpoint import load_checkpoint_auto, load_config
from .training.train_state import TrainState


def calibrate_act_stats(config: ExperimentConfig, params, split,
                        batch_size: int = 8, max_batches: int = 4):
    """Absmax activation statistics for int8 static-scale quantization.

    Runs the deterministic serving forward with
    ``mmbert_forward(collect_act_stats=True)`` over up to ``max_batches``
    batches of ``split`` (a FeaturizedSplit) and returns the elementwise-max
    per-layer stats dict that ``ops.quant.quantize_bert_params`` consumes.
    """
    cfg = config.model
    tc = config.train
    dtype = jnp.bfloat16 if tc.compute_dtype == "bfloat16" else jnp.float32
    from .ops.attention import default_on_tpu
    on_tpu = default_on_tpu()

    @jax.jit
    def stats_fn(params, ids, mask, visual, speech):
        out = mmbert_forward(
            params, ids, mask, ids, ids, visual, speech, cfg,
            deterministic=True, compute_dtype=dtype,
            use_flash=tc.use_flash_attention, on_tpu=on_tpu,
            mlm_scores=False, fuse_text_pass=tc.fuse_text_pass,
            collect_act_stats=True)
        return out["act_stats"]

    n = split.input_ids.shape[0]
    if n == 0:
        raise ValueError("empty calibration split")
    agg = None
    for start in range(0, min(n, batch_size * max_batches), batch_size):
        end = min(start + batch_size, n)

        def prep(x):
            x = np.asarray(x[start:end])
            if len(x) < batch_size:
                # Fill partial batches by REPEATING real rows, not zero
                # padding: an all-zero row has an all-zero attention mask,
                # and its degenerate uniform-softmax activations feed the
                # absmax max-reduce and loosen the static scales (round-3
                # ADVICE item 2).  max() over repeats is a no-op.
                reps = -(-batch_size // len(x))
                x = np.concatenate([x] * reps)[:batch_size]
            return x

        s = jax.device_get(stats_fn(
            params, prep(split.input_ids), prep(split.attention_mask),
            prep(split.visual), prep(split.speech)))
        agg = s if agg is None else jax.tree.map(np.maximum, agg, s)
    return agg


class Predictor:
    """Sentiment predictions from aligned tri-modal inputs."""

    def __init__(self, config: ExperimentConfig, params,
                 batch_size: int = 8, mesh=None, quantize: str | None = None,
                 inflight_batches: int = 64, calibration=None,
                 fuse_qkv: bool = False):
        """``quantize='int8'`` runs the encoder's six big projections on the
        int8 MXU path (ops/quant.py): per-channel int8 weights quantized
        here once, dynamic per-token activation quant in the jit.  Serving
        only; measured ~1.2x serving throughput at bert-large on v5e with
        prediction agreement within the tanh head's noise (tests).

        ``quantize='int8_static'`` additionally replaces the dynamic
        per-token activation quant with static per-(layer, projection)
        scales calibrated on ``calibration`` (a FeaturizedSplit): the
        activation absmax reduce disappears from the jit, so the quantize
        fuses into the producing op and the dequant scale constant-folds.

        ``inflight_batches`` bounds how many dispatched-but-unfetched
        batches ``predict_arrays`` keeps in flight (memory bound for big
        splits) while still amortizing the device round-trip over the
        window."""
        self.config = config
        self.batch_size = batch_size
        self.inflight_batches = max(1, int(inflight_batches))
        tc = config.train
        self.mesh = mesh if mesh is not None else make_mesh(
            tc.data_parallel, tc.model_parallel)
        # fuse_qkv is opt-in and OFF by default: both fused variants
        # measured LOSING at the B=96 serving shape (BENCH.md round-4 int8
        # decomposition -- slicing q/k/v back out adds 3.5 ms of copies,
        # and feeding the packed kernel directly makes the [H, 3H] int8 dot
        # itself slower than 3x[H, H]).  Kept for A/B reproduction; it also
        # shards wrongly under tensor parallelism (contiguous model-axis
        # chunks of the 3H output mix q with k), hence the mesh guard.
        if fuse_qkv:
            from .parallel.mesh import MODEL_AXIS
            if self.mesh.shape.get(MODEL_AXIS, 1) != 1:
                raise ValueError("fuse_qkv requires a mesh without a "
                                 "model axis (ops/quant.py docstring)")
        if quantize == "int8":
            from .ops.quant import quantize_bert_params
            params = quantize_bert_params(params, fuse_qkv=fuse_qkv)
        elif quantize == "int8_static":
            if calibration is None:
                raise ValueError(
                    "quantize='int8_static' needs calibration= a "
                    "FeaturizedSplit to derive static activation scales")
            from .ops.quant import quantize_bert_params
            stats = calibrate_act_stats(config, params, calibration,
                                        batch_size=batch_size)
            params = quantize_bert_params(params, act_stats=stats,
                                          fuse_qkv=fuse_qkv)
        elif quantize is not None:
            raise ValueError(f"unknown quantize mode: {quantize!r}")
        self._multiprocess = jax.process_count() > 1
        shardings = param_shardings(params, self.mesh)
        if self._multiprocess:
            # multi-host serving: assemble global param arrays from host
            # data (device_put cannot reach other processes' shards)
            from .parallel.distributed import global_batch_array
            self.params = jax.tree.map(
                lambda x, s: global_batch_array(s, np.asarray(x)),
                jax.device_get(params), shardings)
        else:
            self.params = jax.device_put(params, shardings)
        from jax.sharding import NamedSharding, PartitionSpec
        from .parallel.mesh import DATA_AXIS
        self._batch_sharding = NamedSharding(self.mesh,
                                             PartitionSpec(DATA_AXIS))
        self._replicated = NamedSharding(self.mesh, PartitionSpec())
        if self.batch_size % self.mesh.shape[DATA_AXIS]:
            raise ValueError(
                f"batch_size {self.batch_size} must be a multiple of the "
                f"data-axis size {self.mesh.shape[DATA_AXIS]}")
        cfg = config.model
        dtype = jnp.bfloat16 if tc.compute_dtype == "bfloat16" else jnp.float32
        # Ship float features to the device in the compute dtype: the jit
        # casts visual/speech to bf16 on arrival anyway (joint_embed), so a
        # host-side cast is bit-identical and HALVES the per-batch feature
        # transfer (~1.8 MB f32 at B=96 over a tunneled device).  The only
        # pre-cast consumer is pair_frame_mask's nonzero test, and z-normed
        # features cannot round to zero in bf16.
        self._wire_dtype = (jnp.bfloat16  # ml_dtypes scalar; numpy-castable
                            if tc.compute_dtype == "bfloat16" else None)
        from .ops.attention import default_on_tpu
        on_tpu = default_on_tpu()  # host-side resolution, threaded into jit

        mesh = self.mesh

        def forward(params, ids, mask, visual, speech):
            out = mmbert_forward(
                params, ids, mask, ids, ids, visual, speech, cfg,
                deterministic=True, compute_dtype=dtype,
                use_flash=tc.use_flash_attention, on_tpu=on_tpu,
                mlm_scores=False,
                fuse_text_pass=tc.fuse_text_pass,
                mesh=mesh, sequence_parallel=tc.sequence_parallel)
            logits = out["logits"]
            if cfg.regression:
                preds = jnp.tanh(logits) if cfg.num_labels == 1 else logits
                return preds.reshape(-1)
            return jnp.argmax(jax.nn.sigmoid(logits), axis=1)

        # multi-process: replicate outputs so the host fetch in
        # predict_arrays never touches a non-addressable shard
        self._forward = (jax.jit(forward, out_shardings=self._replicated)
                         if self._multiprocess else jax.jit(forward))

    @classmethod
    def from_checkpoint(cls, directory: str, batch_size: int = 8,
                        mesh=None, model_num: int | None = None,
                        quantize: str | None = None,
                        calibration=None) -> "Predictor":
        from .training.checkpoint import resolve_checkpoint
        directory = resolve_checkpoint(directory, model_num)
        config = load_config(directory)
        if config is None:
            raise FileNotFoundError(f"no config.json in {directory}")
        params = init_mmbert_params(jax.random.key(0), config.model)
        # the msgpack layout includes optimizer state; build a matching template
        from .training.optim import make_optimizer
        tx = make_optimizer(config.train, 1)
        template = TrainState(params=params, opt_state=tx.init(params),
                              step=jnp.zeros((), jnp.int32))
        state, _ = load_checkpoint_auto(directory, template)
        return cls(config, state.params, batch_size, mesh, quantize=quantize,
                   calibration=calibration)

    def predict_arrays(self, input_ids: np.ndarray, attention_mask: np.ndarray,
                       visual: np.ndarray, speech: np.ndarray) -> np.ndarray:
        """[N, L] ids/mask + [N, L, D*] features -> [N] predictions.

        Batches are dispatched ahead of the device fetch: on a remote/
        tunneled device a per-batch sync would pay the round-trip latency
        N/bs times (measured 2x total throughput on the axon v5e).  At most
        ``inflight_batches`` dispatches are outstanding at once, so host
        memory for un-fetched outputs and pending dispatch buffers stays
        bounded on arbitrarily large splits.
        """
        n = input_ids.shape[0]
        bs = self.batch_size
        out: list = []
        pending = []  # (device preds, real length)

        def drain(count=None):
            # Fetching only the OLDEST half when the window fills keeps the
            # device's dispatch queue primed during the tunnel round-trip;
            # a full drain left it idle once per window (measured ~9% of
            # serving throughput at the bench split size).
            take = pending if count is None else pending[:count]
            host = jax.device_get([p for p, _ in take])
            out.extend(np.asarray(p)[:k] for p, (_, k) in zip(host, take))
            del pending[:len(take)]

        for start in range(0, n, bs):
            end = min(start + bs, n)
            pad = bs - (end - start)
            sl = slice(start, end)

            def prep(x):
                x = np.asarray(x[sl])
                if pad:
                    x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
                if self._wire_dtype is not None and x.dtype in (
                        np.float32, np.float64):
                    x = x.astype(self._wire_dtype)  # halve tunnel bytes
                # batch rows sharded over the data axis -> multi-chip serving
                if self._multiprocess:
                    from .parallel.distributed import global_batch_array
                    return global_batch_array(self._batch_sharding, x)
                return jax.device_put(x, self._batch_sharding)

            preds = self._forward(self.params, prep(input_ids),
                                  prep(attention_mask), prep(visual),
                                  prep(speech))
            pending.append((preds, end - start))
            if len(pending) >= self.inflight_batches:
                drain(max(1, self.inflight_batches // 2))
        drain()
        return np.concatenate(out) if out else np.zeros((0,))

    def predict_split(self, split: FeaturizedSplit) -> np.ndarray:
        return self.predict_arrays(split.input_ids, split.attention_mask,
                                   split.visual, split.speech)
