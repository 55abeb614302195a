"""Streaming serving: frame-by-frame generation with incremental audio.

The fully-compiled :func:`csm_tpu.generation.generate_compiled` is the
throughput path (whole utterance = one device program).  Serving wants the
opposite trade: emit each 80 ms frame (and its audio) as soon as it exists.
:class:`CSMStreamer` runs the same jitted frame step in a host loop —
prefill once, then one device call per frame — and optionally feeds a
:class:`csm_tpu.codec.streaming.StreamingMimiDecoder` so callers receive
PCM chunks with ~1-frame latency.

Capability match: BASELINE config 4 — batched concurrent streams with
per-stream stop-on-all-zeros (each stream freezes independently; its
outputs zero-pad once stopped) and on-device streaming Mimi decode.

Token parity: the streamer splits its PRNG key exactly like
``generate_compiled``, so for a given seed the emitted frames equal the
single-program path's.
"""

from __future__ import annotations

import warnings
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from csm_tpu.config import CSMConfig
from csm_tpu.generation import (
    _bucket, _next_frame_inputs, _pad_to_bucket, generate_frame,
)
from csm_tpu.models.llama import KVCache


class CSMStreamer:
    """Stateful frame-by-frame generator over a batch of streams."""

    def __init__(
        self,
        params: dict,
        config: CSMConfig,
        codec=None,
        temperature: float = 1.0,
        topk: int = 50,
        greedy: bool = False,
        stop_on_all_zeros: bool = True,
        qdec: Optional[dict] = None,
        qbb: Optional[dict] = None,
        qsb: Optional[dict] = None,
        specdec: bool = False,
    ):
        self.params = params
        self.config = config
        self.codec = codec
        self.temperature = temperature
        self.topk = topk
        self.greedy = greedy
        self.stop_on_all_zeros = stop_on_all_zeros

        # Quantized fast paths — same contract as CSMServer: the fused
        # decoder kernel (qdec), W8A16 backbone (qbb), or streamed-weight
        # backbone kernel (qsb, up to its MAX_VALIDATED_B; csm.forward
        # falls back past it) apply to the per-frame steps; prefill
        # conditions on the prompt in full bf16 (qdec only).  Passed as jit
        # ARGUMENTS, not closure captures (captured pytrees inline a
        # gigabyte of weights into the HLO).
        self._qdec = qdec
        self._qbb = qbb
        self._qsb = qsb
        self._prefill = jax.jit(
            lambda p, ids, mask, tl, cache, key, qd: generate_frame(
                p, config, ids, mask, cache=cache, rng=key,
                temperature=temperature, topk=topk, greedy=greedy,
                true_len=tl, flash_prefill=True, qdec=qd, specdec=specdec,
            )
        )
        self._step = jax.jit(
            lambda p, ids, mask, cache, key, qd, qb, qs: generate_frame(
                p, config, ids, mask, cache=cache, rng=key,
                temperature=temperature, topk=topk, greedy=greedy,
                qdec=qd, qbb=qb, qsb=qs, specdec=specdec,
            )
        )

        self.cache: Optional[KVCache] = None
        self._rng = None
        self._decoder = None
        self._done = None
        self._last_frame = None
        self._prefixes: dict = {}  # prefix_id -> (seeded KVCache, n_frames)
        self._prefix_seq = 0  # monotonic: ids never reused after drop_prefix
        # Continuation prefill against a prefix-seeded cache (index > 0):
        # the flash prefill kernel assumes start-0 queries, so the twin
        # program takes the masked-bias path.
        self._prefill_cont = jax.jit(
            lambda p, ids, mask, tl, cache, key, qd: generate_frame(
                p, config, ids, mask, cache=cache, rng=key,
                temperature=temperature, topk=topk, greedy=greedy,
                true_len=tl, flash_prefill=False, qdec=qd, specdec=specdec,
            )
        )

    # ------------------------------------------------------------------

    def register_prefix(self, input_ids, attention_mask,
                        max_new_frames: int = 1024) -> str:
        """Prefill a shared context ONCE (e.g. a fixed speaker's
        voice-cloning clip) for reuse across streaming sessions:
        ``start(prefix_id=...)`` then prefills only the new frames.  The
        prefix cache is sized for ``max_new_frames`` of decode; sessions
        on it must fit that window."""
        ids = np.asarray(input_ids)
        mask = np.asarray(attention_mask, np.float32)
        ids, mask, S, Sb = _pad_to_bucket(ids, mask)
        B = ids.shape[0]
        cache_len = min(self.config.max_seq_len, Sb + max_new_frames)
        cache_len = ((cache_len + 127) // 128) * 128
        dtype = self.params["backbone"]["final_norm"].dtype
        cache = KVCache.create(self.config.backbone, B, cache_len, dtype=dtype)
        out = self._prefill(
            self.params, jnp.asarray(ids), jnp.asarray(mask), jnp.int32(S),
            cache, jax.random.key(0), self._qdec,
        )  # sampled frame discarded; sampling never writes the cache
        pid = f"prefix-{self._prefix_seq}"
        self._prefix_seq += 1
        self._prefixes[pid] = (out.cache, S)
        return pid

    def drop_prefix(self, prefix_id) -> None:
        """Release a registered prefix's device memory."""
        self._prefixes.pop(prefix_id, None)

    def start(self, input_ids, attention_mask, rng: Optional[jax.Array] = None,
              max_new_frames: int = 1024, prefix_id=None) -> np.ndarray:
        """Prefill the prompt and emit the first frame.  Returns ``[B, 32]``.

        ``prefix_id`` (from :meth:`register_prefix`): ``input_ids`` is then
        the continuation only; the prefix's cached K/V seeds the session
        (token streams equal the full-prompt session exactly)."""
        from csm_tpu.codec.streaming import StreamingMimiDecoder

        ids = np.asarray(input_ids)
        mask = np.asarray(attention_mask, np.float32)
        ids, mask, S, Sb = _pad_to_bucket(ids, mask)
        B = ids.shape[0]

        if prefix_id is not None:
            cache, S0 = self._prefixes[prefix_id]
            if cache.k.shape[1] != B:
                raise ValueError(
                    f"prefix batch ({cache.k.shape[1]}) != session batch ({B})"
                )
            if S0 + Sb + max_new_frames > cache.max_len:
                raise ValueError(
                    f"prefix window ({cache.max_len}) too small for "
                    f"{S0}+{Sb} prompt frames + {max_new_frames} new; "
                    "register with a larger max_new_frames"
                )
            fill = self._prefill_cont
        else:
            cache_len = min(self.config.max_seq_len, Sb + max_new_frames)
            cache_len = ((cache_len + 127) // 128) * 128  # flash-blockable
            dtype = self.params["backbone"]["final_norm"].dtype
            cache = KVCache.create(
                self.config.backbone, B, cache_len, dtype=dtype
            )
            fill = self._prefill

        rng = rng if rng is not None else jax.random.key(0)
        rng, k0 = jax.random.split(rng)
        out = fill(
            self.params, jnp.asarray(ids), jnp.asarray(mask), jnp.int32(S),
            cache, k0, self._qdec,
        )
        self.cache = out.cache
        self._rng = rng
        self._done = np.zeros((B,), bool)
        self._last_frame = out.samples
        if self.codec is not None:
            self._decoder = StreamingMimiDecoder(self.codec, batch=B)
        return self._observe(out.samples)

    def step(self) -> Optional[np.ndarray]:
        """Generate the next frame for all live streams; ``None`` when every
        stream has stopped."""
        if self._done.all():
            return None
        ids, mask = _next_frame_inputs(self.config, self._last_frame)
        self._rng, k = jax.random.split(self._rng)
        out = self._step(
            self.params, ids, mask, self.cache, k,
            self._qdec, self._qbb, self._qsb,
        )
        self.cache = out.cache
        self._last_frame = out.samples
        return self._observe(out.samples)

    def _observe(self, samples) -> np.ndarray:
        frame = np.asarray(samples)  # [B, 32]
        if self.stop_on_all_zeros:
            zero = (frame == 0).all(axis=1)
            frame = np.where(self._done[:, None], 0, frame)
            self._done |= zero
        return frame

    def decode_audio(self, frame: np.ndarray) -> Optional[np.ndarray]:
        """``[B, 32]`` frame codes → ``[B, samples_per_frame]`` PCM chunk."""
        if self._decoder is None:
            return None
        q = self.codec.num_codebooks
        return self._decoder.feed(frame[:, :q, None])

    def run(self, input_ids, attention_mask, max_new_frames: int = 100,
            rng: Optional[jax.Array] = None) -> Iterator[dict]:
        """Generator over frames: yields ``{"frame": [B,32], "audio":
        [B, hop] | None, "done": [B] bool}`` until all streams stop or the
        frame budget is spent."""
        frame = self.start(input_ids, attention_mask, rng=rng,
                           max_new_frames=max_new_frames)
        emitted = 0
        while frame is not None and emitted < max_new_frames:
            if self.stop_on_all_zeros and self._done.all() and (frame == 0).all():
                break
            yield {
                "frame": frame,
                "audio": self.decode_audio(frame),
                "done": self._done.copy(),
            }
            emitted += 1
            if emitted >= max_new_frames:
                break
            frame = self.step()


# ---------------------------------------------------------------------------
# Continuous batching
# ---------------------------------------------------------------------------


class CSMServer:
    """Slot-based continuous batching over a fixed decode batch.

    A capability superset of the reference's inference entry point
    (``/root/reference/README.md:102-118``): ``n_slots`` streams decode in
    lockstep as ONE ``[B, 1, 33]`` jitted step; new requests are admitted
    into freed slots **mid-flight** with ragged prompt lengths.  Admission
    prefetches the prompt through a B=1 prefill program and scatters its
    K/V rows + validity + write index into the shared cache, so running
    streams are untouched.

    TPU design points:
    - the shared ``KVCache`` carries a per-slot ``index`` **vector** — each
      slot sits at its own depth in the static window (ragged batching with
      zero dynamic shapes);
    - per-slot PRNG key streams and per-stream sampling
      (:func:`csm_tpu.ops.sampling.sample_topk_batch`) make every request's
      token stream equal to its solo run — batch composition cannot change
      outputs (token-for-token, greedy or sampled);
    - per-REQUEST sampling parameters
      (``submit(..., temperature=, topk=, greedy=)``): temperature/top-k
      ride as dynamic per-row vectors (no recompile when they mix), and a
      greedy request inside a sampled batch is exactly argmax (top-1 with
      zeroed Gumbel noise);
    - PREFIX CACHING (:meth:`register_prefix` / ``submit(prefix_id=)``):
      a shared voice-cloning context prefills once and each request
      prefills only its continuation — token-exact vs the full-prompt
      run; and :meth:`cancel` frees a slot mid-stream;
    - finished slots keep stepping on garbage (their writes land in a slot
      that admission fully overwrites) — the batch shape never changes, so
      the step stays within two compiled programs (a closure-static
      default-parameter variant for the common all-defaults case, and the
      per-row-vector variant when request parameters mix);
    - STREAMING AUDIO (``codec=``): each slot owns a batch-1
      ``StreamingMimiDecoder`` reset at admission; every generated frame is
      decoded to an 80 ms PCM hop as it is observed, and a finished
      request's full waveform lands in :attr:`audio` next to its token
      frames in :attr:`results` (BASELINE config 4's "on-device streaming
      Mimi decode"; the reference's offline equivalent is
      ``/root/reference/README.md:114-118``).
    """

    def __init__(
        self,
        params: dict,
        config: CSMConfig,
        n_slots: int = 8,
        window: int = 1024,
        temperature: float = 1.0,
        topk: int = 50,
        greedy: bool = False,
        stop_on_all_zeros: bool = True,
        max_new_frames: int = 100,
        qdec: Optional[dict] = None,
        qbb: Optional[dict] = None,
        qsb: Optional[dict] = None,
        codec=None,
        specdec: bool = False,
    ):
        self.params = params
        self.config = config
        self.n_slots = n_slots
        # 128-aligned so the flash prefill can block the window.
        self.window = ((min(window, config.max_seq_len) + 127) // 128) * 128
        self.stop_on_all_zeros = stop_on_all_zeros
        self.default_max_new_frames = max_new_frames

        # Quantized fast paths (csm_tpu/ops/{fused_decoder,quant,bb_kernel}):
        # the batched fused decoder kernel rides the same serial matvecs for
        # all slots, the int8 backbone halves decode-step weight traffic, and
        # ``qsb`` replaces it with the streamed-weight backbone kernel
        # (fastest; engages up to bb_kernel.MAX_VALIDATED_B slots, XLA
        # fallback past it).  Prefill always stays bf16.  The bundles are jit
        # ARGUMENTS, never closure captures — captured pytrees get inlined
        # into the HLO as constants (a gigabyte of weights in the request).
        self._qdec = qdec
        self._qbb = qbb
        self._qsb = qsb
        # Per-request sampling parameters ride as DYNAMIC [n_slots] vectors
        # (per-row temperature / top-k / greedy mask — see
        # ops.fused_decoder._sample_row): mixing parameters never triggers
        # a recompile.  A server built with ``greedy=True`` compiles the
        # deterministic program instead and ignores per-request overrides.
        self._prefill = jax.jit(
            lambda p, ids, mask, tl, cache, keys, qd, tv, kv, gv: generate_frame(
                p, config, ids, mask, cache=cache, rng=keys,
                temperature=tv, topk=kv, greedy=greedy,
                true_len=tl, flash_prefill=True, qdec=qd,
                greedy_rows=None if greedy else gv,
            )
        )
        # Continuation prefill against a PREFIX-seeded cache (cache.index
        # > 0): the flash prefill kernel assumes queries start at absolute
        # position 0, so this twin program takes the masked-bias path.
        self._prefill_cont = jax.jit(
            lambda p, ids, mask, tl, cache, keys, qd, tv, kv, gv: generate_frame(
                p, config, ids, mask, cache=cache, rng=keys,
                temperature=tv, topk=kv, greedy=greedy,
                true_len=tl, flash_prefill=False, qdec=qd,
                greedy_rows=None if greedy else gv,
            )
        )
        def _step1(p, ids, mask, cache, rngs, qd, qb, qs, tv, kv, gv):
            # Key split lives INSIDE the jit: an eager vmap(split) is its
            # own device program — a whole extra tunnel round-trip per
            # serving step (~25 ms here; measured by the steady-state
            # check's dispatch baseline).
            pair = jax.vmap(jax.random.split)(rngs)
            out = generate_frame(
                p, config, ids, mask, cache=cache, rng=pair[:, 1],
                temperature=tv, topk=kv, greedy=greedy,
                qdec=qd, qbb=qb, qsb=qs,
                greedy_rows=None if greedy else gv,
                specdec=specdec,
            )
            return out, pair[:, 0]

        self._step = jax.jit(_step1)

        # Device-side multi-step loop: one dispatch advances every slot by
        # ``n`` frames (a lax.scan of the step body) — host round-trip cost
        # amortizes over the chunk.  Admission only happens between chunks.
        def _steps(p, cache, rngs, last, qd, qb, qs, tv, kv, gv, n):
            def body(carry, _):
                cache, rngs, last = carry
                ids, mask = _next_frame_inputs(config, last)
                pair = jax.vmap(jax.random.split)(rngs)
                out = generate_frame(
                    p, config, ids, mask, cache=cache, rng=pair[:, 1],
                    temperature=tv, topk=kv, greedy=greedy,
                    qdec=qd, qbb=qb, qsb=qs,
                    greedy_rows=None if greedy else gv,
                    specdec=specdec,
                )
                return (out.cache, pair[:, 0], out.samples), out.samples

            (cache, rngs, last), frames = jax.lax.scan(
                body, (cache, rngs, last), None, length=n
            )
            return cache, rngs, last, frames  # frames [n, B, 32]

        self._step_many = jax.jit(_steps, static_argnames=("n",))

        # Uniform-parameter fast path: when every live request uses the
        # server defaults (the common case), these closure-static variants
        # keep the XLA sampler on its static lax.top_k formulation instead
        # of the per-row sort path.  Outputs are bitwise identical — the
        # per-request tests compare both against static solo runs.
        self._prefill_u = jax.jit(
            lambda p, ids, mask, tl, cache, keys, qd: generate_frame(
                p, config, ids, mask, cache=cache, rng=keys,
                temperature=temperature, topk=topk, greedy=greedy,
                true_len=tl, flash_prefill=True, qdec=qd, specdec=specdec,
            )
        )
        self._prefill_cont_u = jax.jit(
            lambda p, ids, mask, tl, cache, keys, qd: generate_frame(
                p, config, ids, mask, cache=cache, rng=keys,
                temperature=temperature, topk=topk, greedy=greedy,
                true_len=tl, flash_prefill=False, qdec=qd, specdec=specdec,
            )
        )
        def _step1_u(p, ids, mask, cache, rngs, qd, qb, qs):
            pair = jax.vmap(jax.random.split)(rngs)  # see _step1
            out = generate_frame(
                p, config, ids, mask, cache=cache, rng=pair[:, 1],
                temperature=temperature, topk=topk, greedy=greedy,
                qdec=qd, qbb=qb, qsb=qs, specdec=specdec,
            )
            return out, pair[:, 0]

        self._step_u = jax.jit(_step1_u)

        def _steps_u(p, cache, rngs, last, qd, qb, qs, n):
            def body(carry, _):
                cache, rngs, last = carry
                ids, mask = _next_frame_inputs(config, last)
                pair = jax.vmap(jax.random.split)(rngs)
                out = generate_frame(
                    p, config, ids, mask, cache=cache, rng=pair[:, 1],
                    temperature=temperature, topk=topk, greedy=greedy,
                    qdec=qd, qbb=qb, qsb=qs, specdec=specdec,
                )
                return (out.cache, pair[:, 0], out.samples), out.samples

            (cache, rngs, last), frames = jax.lax.scan(
                body, (cache, rngs, last), None, length=n
            )
            return cache, rngs, last, frames

        self._step_many_u = jax.jit(_steps_u, static_argnames=("n",))

        def _admit(cache, small, slot, true_len, rngs, key, frame, frames):
            k = jax.lax.dynamic_update_slice(cache.k, small.k, (0, slot, 0, 0, 0))
            v = jax.lax.dynamic_update_slice(cache.v, small.v, (0, slot, 0, 0, 0))
            valid = jax.lax.dynamic_update_slice(cache.valid, small.valid, (slot, 0))
            index = cache.index.at[slot].set(true_len)
            cache = cache.replace(k=k, v=v, valid=valid, index=index)
            rngs = rngs.at[slot].set(key)
            frames = jax.lax.dynamic_update_slice(frames, frame, (slot, 0))
            return cache, rngs, frames

        self._admit = jax.jit(_admit, donate_argnums=(0, 4, 7))

        dtype = params["backbone"]["final_norm"].dtype
        cache = KVCache.create(config.backbone, n_slots, self.window, dtype=dtype)
        self.cache = cache.replace(index=jnp.zeros((n_slots,), jnp.int32))
        self._rngs = jax.random.split(jax.random.key(0), n_slots)
        self._last = jnp.zeros((n_slots, config.audio_num_codebooks), jnp.int32)

        self._slot_req = [None] * n_slots  # request id per slot
        self._depth = np.zeros(n_slots, np.int64)  # host mirror of index
        self._budget = np.zeros(n_slots, np.int64)
        # Per-slot sampling parameters (host mirrors of the step vectors);
        # server-level values are the defaults for requests that don't
        # override them.
        self._temp_v = np.full(n_slots, temperature, np.float32)
        self._topk_v = np.full(n_slots, topk, np.int32)
        self._greedy_v = np.zeros(n_slots, bool)
        self._pending: list = []
        self._next_id = 0
        self.results: dict = {}
        self._frames: dict = {}
        # Canonicalize through float32: slot temps live in a float32 vector
        # (``_temp_v``), so comparing against a raw Python double would be
        # always-False for values like 0.9 and silently disable the uniform
        # fast-path programs.
        self._default_temp = float(np.float32(temperature))
        self._default_topk = int(topk)
        self._prefixes: dict = {}  # prefix_id -> (seeded KVCache, n_frames)
        self._prefix_seq = 0  # monotonic: ids never reused after drop_prefix
        self._n_frames = 0  # telemetry (stats())
        self._n_prefills = 0
        self._n_prefix_prefills = 0

        # Streaming audio (BASELINE config 4: on-device streaming Mimi
        # decode per stream).  Each slot owns a batch-1 StreamingMimiDecoder
        # whose conv/transformer state is RESET at admission — slots sit at
        # unrelated positions in unrelated utterances, so a shared batched
        # decoder state (one scalar stream position) cannot serve them.
        # The decoder objects persist across requests (their jitted step is
        # compiled once); only the state pytree is re-zeroed.
        self.codec = codec
        self._slot_dec = [None] * n_slots
        self.audio: dict = {}  # rid -> [n_samples] f32 PCM (finished)
        self._pcm: dict = {}  # rid -> list of per-frame chunks (running)
        self._n_audio_samples = 0

    # ------------------------------------------------------------------

    @property
    def active_slots(self):
        return [s for s in range(self.n_slots) if self._slot_req[s] is not None]

    def _uniform_active(self) -> bool:
        """True when every live slot runs the server-default sampling
        parameters — the dispatcher then uses the closure-static programs
        (original static-top_k sampler; bitwise-identical outputs)."""
        return all(
            (not self._greedy_v[s])
            and self._temp_v[s] == self._default_temp
            and self._topk_v[s] == self._default_topk
            for s in self.active_slots
        )

    def stats(self) -> dict:
        """Serving telemetry snapshot: slot occupancy, queue depth, frames
        emitted, prefill counts (split by prefix reuse), and per-slot
        context depths — the metrics a deployment scrapes."""
        return {
            "n_slots": self.n_slots,
            "active_slots": len(self.active_slots),
            "queued": len(self._pending),
            "completed": len(self.results),
            "frames_emitted": int(self._n_frames),
            "audio_samples": int(self._n_audio_samples),
            "prefills": int(self._n_prefills),
            "prefix_prefills": int(self._n_prefix_prefills),
            "prefixes_registered": len(self._prefixes),
            "slot_depths": self._depth.tolist(),
            "window": self.window,
        }

    def register_prefix(self, input_ids, attention_mask, prefix_id=None) -> str:
        """Prefill a shared conversation prefix ONCE (e.g. the voice-cloning
        context clip + transcript of the README recipe) and cache its K/V on
        device; requests submitted with ``prefix_id=`` start from it and
        prefill only their own continuation frames.

        ``prefix_id``: stack on an EXISTING prefix (context trees — e.g. a
        base speaker context extended per conversation): the new frames
        prefill against the parent's cached K/V, producing an independent
        child prefix (the parent stays registered and reusable).

        Returns a prefix id.  Each registration holds one window-sized
        KVCache on HBM until :meth:`drop_prefix`.  The token streams are
        the same as submitting ``[prefix; continuation]`` as one prompt —
        the cached path always attends over the full static window, so the
        math is identical (tested)."""
        ids = np.asarray(input_ids)
        mask = np.asarray(attention_mask, np.float32)
        B, S, W = ids.shape
        assert B == 1, "register one conversation prefix at a time"
        if prefix_id is not None:
            parent, S0 = self._prefixes[prefix_id]
        else:
            parent, S0 = None, 0
        if S0 + S >= self.window:
            raise ValueError(
                f"prefix ({S0}+{S}) must leave room in the window "
                f"({self.window})"
            )
        ids, mask, S, Sb = _pad_to_bucket(ids, mask, cap=self.window)
        if S0 + Sb > self.window:
            raise ValueError(
                f"parent prefix ({S0}) + bucket ({Sb}) exceed the window "
                f"({self.window})"
            )
        dtype = self.params["backbone"]["final_norm"].dtype
        if parent is None:
            small = KVCache.create(
                self.config.backbone, 1, self.window, dtype=dtype
            )
        else:
            small = parent  # functional arrays: the parent is not mutated
        # Reuse the compiled uniform prefill programs; the sampled frame is
        # discarded (sampling never writes the cache).
        fill_u = self._prefill_u if parent is None else self._prefill_cont_u
        out = fill_u(
            self.params, jnp.asarray(ids), jnp.asarray(mask), jnp.int32(S),
            small, jax.random.key(0)[None], self._qdec,
        )
        pid = f"prefix-{self._prefix_seq}"
        self._prefix_seq += 1
        self._prefixes[pid] = (out.cache, S0 + S)
        return pid

    def drop_prefix(self, prefix_id) -> None:
        """Release a registered prefix's device memory."""
        self._prefixes.pop(prefix_id, None)

    def submit(self, input_ids, attention_mask, rng=None,
               max_new_frames: Optional[int] = None,
               temperature: Optional[float] = None,
               topk: Optional[int] = None,
               greedy: bool = False,
               prefix_id=None) -> int:
        """Queue a request; admit it immediately if a slot is free.
        Returns the request id (key into :attr:`results` when finished).

        ``temperature`` / ``topk`` / ``greedy`` override the server-level
        sampling parameters for THIS request only (per-row dynamic inputs —
        no recompile).  ``greedy=True`` makes the request deterministic
        (exactly argmax) while other slots keep sampling; it is ignored on
        a server built with ``greedy=True`` (already deterministic).

        ``prefix_id`` (from :meth:`register_prefix`): ``input_ids`` is then
        the CONTINUATION only — the prefix's cached K/V seeds the slot and
        only the continuation frames are prefilled."""
        if prefix_id is not None and prefix_id not in self._prefixes:
            raise KeyError(f"unknown prefix_id {prefix_id!r}")
        rid = self._next_id
        self._next_id += 1
        if rng is None:
            rng = jax.random.key(1000 + rid)
        self._pending.append((
            rid, np.asarray(input_ids), np.asarray(attention_mask, np.float32),
            rng, max_new_frames or self.default_max_new_frames,
            self._default_temp
            if temperature is None
            else float(np.float32(temperature)),
            self._default_topk if topk is None else int(topk),
            bool(greedy), prefix_id,
        ))
        self._drain_pending()
        return rid

    def _drain_pending(self):
        while self._pending:
            free = [s for s in range(self.n_slots) if self._slot_req[s] is None]
            if not free:
                return
            rid, ids, mask, rng, budget, temp, k, gr, pid = self._pending.pop(0)
            self._admit_request(free[0], rid, ids, mask, rng, budget,
                                temp, k, gr, pid)

    def _admit_request(self, slot, rid, ids, mask, rng, budget,
                       temp=None, k=None, gr=False, prefix_id=None):
        temp = self._default_temp if temp is None else temp
        k = self._default_topk if k is None else k
        B, S, W = ids.shape
        assert B == 1, "submit one conversation per request"
        if prefix_id is not None:
            if prefix_id not in self._prefixes:
                # Dropped while the request sat in the queue: fail THIS
                # request softly instead of crashing the serving loop.
                warnings.warn(
                    f"request {rid}: prefix {prefix_id!r} was dropped while "
                    "queued; recording an empty result"
                )
                self.results[rid] = np.zeros(
                    (0, self.config.audio_num_codebooks), np.int64
                )
                if self.codec is not None:
                    self.audio[rid] = np.zeros((0,), np.float32)
                return
            pre_cache, S0 = self._prefixes[prefix_id]
        else:
            pre_cache, S0 = None, 0
        ids, mask, S, Sb = _pad_to_bucket(ids, mask, cap=self.window)
        if S0 + S > self.window:
            raise ValueError(
                f"prompt ({S0}+{S}) exceeds the serving window ({self.window})"
            )
        if S0 + Sb > self.window:
            raise ValueError(
                f"prefix ({S0}) + continuation bucket ({Sb}) exceed the "
                f"serving window ({self.window}); shorten one of them"
            )

        dtype = self.params["backbone"]["final_norm"].dtype
        uni = (
            temp == self._default_temp
            and k == self._default_topk
            and not gr
        )
        if pre_cache is None:
            small = KVCache.create(
                self.config.backbone, 1, self.window, dtype=dtype
            )
            fill = self._prefill_u if uni else self._prefill
        else:
            small = pre_cache  # shared, never donated — reusable across slots
            # bias path: queries start at S0 > 0
            fill = self._prefill_cont_u if uni else self._prefill_cont
        # Same key schedule as a solo generate_compiled(rng=[key]) run.
        pair = jax.random.split(rng)
        rng, k0 = pair[0], pair[1]
        extra = () if uni else (
            jnp.full((1,), temp, jnp.float32),
            jnp.full((1,), k, jnp.int32),
            jnp.full((1,), gr, bool),
        )
        out = fill(
            self.params, jnp.asarray(ids), jnp.asarray(mask), jnp.int32(S),
            small, k0[None], self._qdec, *extra,
        )

        self._n_prefills += 1
        if pre_cache is not None:
            self._n_prefix_prefills += 1
        self.cache, self._rngs, self._last = self._admit(
            self.cache, out.cache, slot, jnp.int32(S0 + S),
            self._rngs, rng, out.samples, self._last,
        )
        self._slot_req[slot] = rid
        self._depth[slot] = S0 + S
        self._budget[slot] = budget
        self._temp_v[slot] = temp
        self._topk_v[slot] = k
        self._greedy_v[slot] = gr
        self._frames[rid] = []
        if self.codec is not None:
            from csm_tpu.codec.streaming import StreamingMimiDecoder

            if self._slot_dec[slot] is None:
                self._slot_dec[slot] = StreamingMimiDecoder(self.codec, batch=1)
            else:
                self._slot_dec[slot].reset()
            self._pcm[rid] = []
        self._observe(slot, np.asarray(out.samples)[0])

    def _observe(self, slot, frame: np.ndarray, drain: bool = True):
        rid = self._slot_req[slot]
        stopped = self.stop_on_all_zeros and not frame.any()
        if not stopped:
            self._frames[rid].append(frame.copy())
            if self.codec is not None:
                # One frame of codes -> one hop of PCM through this slot's
                # streaming decoder (state carried frame to frame, reset at
                # admission).  The stop frame itself is never voiced — it
                # is the EOS marker, matching the reference recipe which
                # decodes only the returned frames
                # (/root/reference/README.md:114-118).
                q = self.codec.num_codebooks
                chunk = self._slot_dec[slot].feed(frame[None, :q, None])
                self._pcm[rid].append(chunk[0])
                self._n_audio_samples += chunk.shape[-1]
            self._budget[slot] -= 1
            self._depth[slot] += 1
            self._n_frames += 1
        if stopped or self._budget[slot] <= 0 or self._depth[slot] >= self.window:
            self._finish(slot, drain=drain)

    def _finish(self, slot, drain: bool = True):
        rid = self._slot_req[slot]
        frames = self._frames.pop(rid)
        self.results[rid] = (
            np.stack(frames) if frames
            else np.zeros((0, self.config.audio_num_codebooks), np.int64)
        )
        if self.codec is not None:
            pcm = self._pcm.pop(rid, [])
            self.audio[rid] = (
                np.concatenate(pcm) if pcm else np.zeros((0,), np.float32)
            )
        self._slot_req[slot] = None
        if drain:
            self._drain_pending()

    def cancel(self, rid) -> bool:
        """Cancel a request: a queued request is dropped, a running one
        frees its slot at the next admission point; frames generated so
        far land in :attr:`results` (possibly empty).  A freed slot's
        decode work is overwritten by the next admission — running streams
        are untouched.  Returns True if the request was live."""
        for i, item in enumerate(self._pending):
            if item[0] == rid:
                self._pending.pop(i)
                self.results[rid] = np.zeros(
                    (0, self.config.audio_num_codebooks), np.int64
                )
                if self.codec is not None:
                    self.audio[rid] = np.zeros((0,), np.float32)
                return True
        for slot in range(self.n_slots):
            if self._slot_req[slot] == rid:
                self._finish(slot)
                return True
        return False

    def step(self) -> bool:
        """Advance every live stream by one frame.  Returns False when no
        requests are active or pending."""
        if not self.active_slots:
            self._drain_pending()
            if not self.active_slots:
                return False
        active_before = list(self.active_slots)
        ids, mask = _next_frame_inputs(self.config, self._last)
        if self._uniform_active():
            out, self._rngs = self._step_u(
                self.params, ids, mask, self.cache, self._rngs,
                self._qdec, self._qbb, self._qsb,
            )
        else:
            out, self._rngs = self._step(
                self.params, ids, mask, self.cache, self._rngs,
                self._qdec, self._qbb, self._qsb,
                jnp.asarray(self._temp_v), jnp.asarray(self._topk_v),
                jnp.asarray(self._greedy_v),
            )
        self.cache = out.cache
        self._last = out.samples
        frames = np.asarray(out.samples)
        for s in active_before:
            self._observe(s, frames[s])
        return bool(self.active_slots or self._pending)

    def step_many(self, n: int) -> bool:
        """Advance every live stream by up to ``n`` frames in ONE device
        dispatch (``lax.scan`` over the step body).

        Slots that stop mid-chunk simply have their later chunk frames
        discarded (their decode work is wasted but harmless — admission
        fully overwrites a freed slot); pending requests are admitted only
        after the chunk.  Use ``step()`` when admission latency matters
        more than dispatch amortization.
        """
        if not self.active_slots:
            self._drain_pending()
            if not self.active_slots:
                return False
        rid_at_start = list(self._slot_req)
        if self._uniform_active():
            cache, rngs, last, frames = self._step_many_u(
                self.params, self.cache, self._rngs, self._last,
                self._qdec, self._qbb, self._qsb, n,
            )
        else:
            cache, rngs, last, frames = self._step_many(
                self.params, self.cache, self._rngs, self._last,
                self._qdec, self._qbb, self._qsb,
                jnp.asarray(self._temp_v), jnp.asarray(self._topk_v),
                jnp.asarray(self._greedy_v), n,
            )
        self.cache, self._rngs, self._last = cache, rngs, last
        frames = np.asarray(frames)  # [n, B, 32]
        for t in range(frames.shape[0]):
            for s in range(self.n_slots):
                if rid_at_start[s] is not None and self._slot_req[s] == rid_at_start[s]:
                    self._observe(s, frames[t, s], drain=False)
        self._drain_pending()
        return bool(self.active_slots or self._pending)

    def run_until_idle(self, max_steps: int = 10_000, chunk: int = 1) -> dict:
        """Drive the server until every submitted request has finished.
        ``chunk > 1`` amortizes host dispatch via :meth:`step_many`."""
        steps = 0
        while steps < max_steps:
            alive = self.step_many(chunk) if chunk > 1 else self.step()
            steps += chunk
            if not alive:
                break
        return self.results
