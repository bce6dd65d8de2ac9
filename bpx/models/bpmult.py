"""BPMulT — the Biprojection Multimodal Transformer model family.

TPU-native rebuild of the two registered reference models
(ref: models/__init__.py:6-14):

* :class:`BPMulTVAPT` (``mmtrvapt``) — the official 4-input model: video,
  audio, poster, text (ref: mmtr.py:277-583).
* :class:`BPMulTVAT` (``mmtrvat``) — the 3-input variant: video, audio, text
  (ref: mmtr.py:587-866).

Dataflow per target modality X (both models; SURVEY.md §2 C12):
  1. encode/project each stream to ``hidden_sz``;
  2. zero-pad every stream to its static ``num_vectors_*`` length;
  3. 6 first-round crossmodal transformers ``trans_x_with_y``
     (ref: mmtr.py:489-498);
  4. 6 biprojection transformers ``trans_x_with_y2z`` attending into the
     already-crossed streams (ref: mmtr.py:503-550; in the 3-input model the
     second round uses plain crossmodal encoders, ref: mmtr.py:642-653);
  5. middle Fusion-GMU over the (length-adapted) first-round streams,
     residual "level 1->2" adds, top Fusion-GMU over the biprojected sums,
     residual "level 1->3" add (ref: mmtr.py:506-519);
  6. summary vector = first + last token of the fused sequence
     (ref: mmtr.py:522 — first token rides BERT's [CLS]);
  7. final N-ary GMU over per-modality summaries (+ poster embedding, + the
     hybrid early-fusion summary when enabled), then a residual MLP head
     (ref: mmtr.py:571-583).

Layout: batch-first ``(B, T, E)`` throughout (the reference is seq-first
``(T, B, E)`` after mmtr.py:459-461 — batch-first is the natural layout for
batch-axis data parallelism on a TPU mesh).

Deliberate divergences from the reference (all are fixes of committed
defects, documented in SURVEY.md §0.1):
* the 3-input final fusion uses a correct 3-ary GMU — the reference's
  ``TextShifting3Layer`` crashes at construction (mmtr.py:199-219);
* the hybrid early-fusion GMU is sized for its actual inputs (the reference
  sizes it for ``reduced_dim`` but feeds ``hidden_sz`` vectors,
  mmtr.py:330-331);
* inputs arrive time-major/feature-last ``(B, T, d)`` for every stream;
  dataset-specific transposes live in the data adapters, not the model.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from bpx.config import ModelConfig
from bpx.ops.audio import make_audio_encoder
from bpx.ops.bert import BertEncoder
from bpx.ops.encoder import TransformerEncoder
from bpx.ops.gmu import GatedBimodalFusionLayer, GatedNModalLayer


def _pad_to_length(x: jax.Array, length: int) -> jax.Array:
    """Zero-pad (B, T, E) along T to ``length`` (ref: mmtr.py:431-441).

    Shapes are static; padding folds into the XLA graph.  Streams longer
    than ``length`` are a config error (the reference would shape-crash).
    """
    T = x.shape[1]
    if T == length:
        return x
    if T > length:
        raise ValueError(f"stream length {T} exceeds configured {length}")
    return jnp.pad(x, ((0, 0), (0, length - T), (0, 0)))


class SeqAdapter(nn.Module):
    """Linear map over the *sequence* axis: (B, T_in, E) -> (B, T_out, E).

    The reference realises this as ``nn.Linear(T_in, T_out)`` applied to a
    (E, B, T) permutation (ref: mmtr.py:380-383, applied at 507-508,530,553).
    Here it is a single einsum against a (T_out, T_in) kernel — one GEMM.
    """

    t_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        t_in = x.shape[1]
        kernel = self.param("kernel",
                            nn.initializers.lecun_normal(), (self.t_out, t_in),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.t_out,),
                          jnp.float32)
        y = jnp.einsum("ut,bte->bue", kernel.astype(self.dtype), x,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        return y + bias.astype(x.dtype)[None, :, None]


class _BPMulTBase(nn.Module):
    """Shared construction/forward machinery for both BPMulT models."""

    config: ModelConfig

    def _dtype(self):
        return jnp.dtype(self.config.compute_dtype)

    # -- construction helpers -------------------------------------------------

    def _encoder(self, name: str, attn_dropout: float, layers: int,
                 biprojection: bool) -> TransformerEncoder:
        cfg = self.config
        return TransformerEncoder(
            embed_dim=cfg.hidden_sz, num_heads=cfg.num_heads,
            layers=max(cfg.layers, layers), attn_dropout=attn_dropout,
            relu_dropout=cfg.relu_dropout, res_dropout=cfg.res_dropout,
            embed_dropout=cfg.embed_dropout, attn_mask=cfg.attn_mask,
            biprojection=biprojection, dtype=self._dtype(),
            attention_impl=cfg.attention_impl,
            scan_layers=(cfg.scan_layers if cfg.scan_encoders is None
                         else cfg.scan_encoders),
            remat=cfg.remat, scan_unroll=cfg.scan_unroll,
            remat_policy=cfg.remat_policy, name=name)

    def _grouped_encoder(self, name: str, attn_dropout: float,
                         biprojection: bool):
        """A pair of same-shape encoders vmapped over a stacked leading axis
        (PERF.md roadmap item 1): params get shape (2, ...), inputs
        (2, B, T, E) — one program, double GEMM batch."""
        cfg = self.config
        grouped_cls = nn.vmap(
            TransformerEncoder,
            in_axes=(0, 0, 0, None),
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
        )
        return grouped_cls(
            embed_dim=cfg.hidden_sz, num_heads=cfg.num_heads,
            layers=cfg.layers, attn_dropout=attn_dropout,
            relu_dropout=cfg.relu_dropout, res_dropout=cfg.res_dropout,
            embed_dropout=cfg.embed_dropout, attn_mask=cfg.attn_mask,
            biprojection=biprojection, dtype=self._dtype(),
            # vmap's pallas_call batching rule rejects the kernel's SMEM
            # scalar args (seed/kv_lens); the einsum path vmaps cleanly and
            # measures within noise of the kernel at these lengths.
            attention_impl="xla",
            scan_layers=(cfg.scan_layers if cfg.scan_encoders is None
                         else cfg.scan_encoders),
            remat=cfg.remat, scan_unroll=cfg.scan_unroll,
            # save_attn names only exist on the pallas path; on this forced
            # xla path the policy would silently save nothing, so state the
            # actual behavior (full recompute) explicitly
            remat_policy=None, name=name)

    def _make_grouped_mesh(self, biprojection_second_round: bool):
        """Grouped variant of the 12-encoder mesh: 6 vmapped pairs.

        Grouping constraints are semantic, not cosmetic: pair members must
        share (Tq, Tk) and attn_dropout.  Pairs (reference names):
        g_va   = (trans_v_with_a,  trans_a_with_v)
        g_xl   = (trans_v_with_l,  trans_a_with_l)
        g_lx   = (trans_l_with_v,  trans_l_with_a)
        g_l_bi = (trans_l_with_v2a, trans_l_with_a2v)
        g_x2l  = (trans_a_with_v2l, trans_v_with_a2l)
        g_xl2  = (trans_a_with_l2v, trans_v_with_l2a)
        """
        cfg = self.config
        assert cfg.attn_dropout_a == cfg.attn_dropout_v, \
            "group_encoders requires attn_dropout_a == attn_dropout_v " \
            "(pair members share one dropout rate)"
        bp = biprojection_second_round
        self.g_va = self._grouped_encoder("g_va", cfg.attn_dropout_a, False)
        self.g_xl = self._grouped_encoder("g_xl", cfg.attn_dropout, False)
        self.g_lx = self._grouped_encoder("g_lx", cfg.attn_dropout_v, False)
        self.g_l_bi = self._grouped_encoder("g_l_bi", cfg.attn_dropout_a, bp)
        self.g_x2l = self._grouped_encoder("g_x2l", cfg.attn_dropout, bp)
        self.g_xl2 = self._grouped_encoder("g_xl2", cfg.attn_dropout_v, bp)

    def _first_round_grouped(self, proj_l, proj_v, proj_a, deterministic):
        """Grouped form of the 6 first-round encoders; same outputs."""
        det = deterministic
        stack = lambda a, b: jnp.stack([a, b])
        # K/V stacks built once so the encoder sees the aliasing (fused kv).
        # (v<-a, a<-v)
        kv = stack(proj_a, proj_v)
        h = self.g_va(stack(proj_v, proj_a), kv, kv, det)
        h_v_with_as, h_a_with_vs = h[0], h[1]
        # (v<-l, a<-l)
        kv = stack(proj_l, proj_l)
        h = self.g_xl(stack(proj_v, proj_a), kv, kv, det)
        h_v_with_ls, h_a_with_ls = h[0], h[1]
        # (l<-v, l<-a)
        kv = stack(proj_v, proj_a)
        h = self.g_lx(stack(proj_l, proj_l), kv, kv, det)
        h_l_with_vs, h_l_with_as = h[0], h[1]
        return (h_v_with_as, h_a_with_vs, h_v_with_ls, h_l_with_vs,
                h_a_with_ls, h_l_with_as)

    def _second_round_grouped(self, proj_l, proj_v, proj_a,
                              h_v_with_as, h_a_with_vs, h_v_with_ls,
                              h_l_with_vs, h_a_with_ls, h_l_with_as,
                              deterministic):
        """Grouped form of the 6 second-round encoders; returns the six
        biprojection outputs in reference naming order."""
        det = deterministic
        stack = lambda a, b: jnp.stack([a, b])
        kv = stack(h_a_with_vs, h_v_with_as)
        h = self.g_l_bi(stack(proj_l, proj_l), kv, kv, det)
        h_l_v2a, h_l_a2v = h[0], h[1]
        kv = stack(h_l_with_vs, h_l_with_as)
        h = self.g_x2l(stack(proj_a, proj_v), kv, kv, det)
        h_a_v2l, h_v_a2l = h[0], h[1]
        kv = stack(h_v_with_ls, h_a_with_ls)
        h = self.g_xl2(stack(proj_a, proj_v), kv, kv, det)
        h_a_l2v, h_v_l2a = h[0], h[1]
        return h_l_v2a, h_l_a2v, h_a_v2l, h_a_l2v, h_v_a2l, h_v_l2a

    def _make_crossmodal_mesh(self, biprojection_second_round: bool):
        """The 12 crossmodal/biprojection encoders (ref: mmtr.py:339-353)."""
        cfg = self.config
        if cfg.group_encoders:
            self._make_grouped_mesh(biprojection_second_round)
            return
        enc = self._encoder
        # First round: plain crossmodal encoders.  Per-target attn dropouts
        # follow get_network's self_type table (ref: mmtr.py:398-419):
        # encoders whose *query* stream is l/a/v use attn_dropout(/a/v).
        self.trans_l_with_a = enc("trans_l_with_a", cfg.attn_dropout_a, -1, False)
        self.trans_l_with_v = enc("trans_l_with_v", cfg.attn_dropout_v, -1, False)
        self.trans_v_with_l = enc("trans_v_with_l", cfg.attn_dropout, -1, False)
        self.trans_v_with_a = enc("trans_v_with_a", cfg.attn_dropout_a, -1, False)
        self.trans_a_with_l = enc("trans_a_with_l", cfg.attn_dropout, -1, False)
        self.trans_a_with_v = enc("trans_a_with_v", cfg.attn_dropout_v, -1, False)
        # Second round ("biprojection"): mmtrvapt builds these with
        # biprojection=True (self-attn + weight-shared cross-attn sublayers,
        # ref: mmtr.py:342-353); mmtrvat uses plain crossmodal encoders
        # (ref: mmtr.py:642-653 — no biprojection kwarg).
        bp = biprojection_second_round
        self.trans_l_with_v2a = enc("trans_l_with_v2a", cfg.attn_dropout_a, -1, bp)
        self.trans_l_with_a2v = enc("trans_l_with_a2v", cfg.attn_dropout_v, -1, bp)
        self.trans_v_with_l2a = enc("trans_v_with_l2a", cfg.attn_dropout_a, -1, bp)
        self.trans_v_with_a2l = enc("trans_v_with_a2l", cfg.attn_dropout, -1, bp)
        self.trans_a_with_v2l = enc("trans_a_with_v2l", cfg.attn_dropout, -1, bp)
        self.trans_a_with_l2v = enc("trans_a_with_l2v", cfg.attn_dropout_v, -1, bp)

    def _make_gmus(self):
        cfg = self.config
        dt = self._dtype()
        # Middle + top Fusion-GMUs per target modality (ref: mmtr.py:314-326).
        self.gmu_l_m = GatedBimodalFusionLayer(cfg.hidden_sz, dt, name="gmu_l_m")
        self.gmu_v_m = GatedBimodalFusionLayer(cfg.hidden_sz, dt, name="gmu_v_m")
        self.gmu_a_m = GatedBimodalFusionLayer(cfg.hidden_sz, dt, name="gmu_a_m")
        self.gmu_l = GatedBimodalFusionLayer(cfg.hidden_sz, dt, name="gmu_l")
        self.gmu_v = GatedBimodalFusionLayer(cfg.hidden_sz, dt, name="gmu_v")
        self.gmu_a = GatedBimodalFusionLayer(cfg.hidden_sz, dt, name="gmu_a")

    def _make_head(self):
        cfg = self.config
        dt = self._dtype()
        dense = lambda feat, name: nn.Dense(
            feat, dtype=dt, kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros, name=name)
        self.proj1 = dense(cfg.hidden_sz, "proj1")
        self.proj2 = dense(cfg.hidden_sz, "proj2")
        self.out_layer = dense(cfg.n_classes, "out_layer")

    def _make_hybrid(self):
        """Early-fusion branch modules (ref: mmtr.py:328-331,387-396)."""
        cfg = self.config
        dt = self._dtype()
        self.trans_l_early = self._encoder("trans_l_early", cfg.attn_dropout, 3, False)
        self.trans_v_early = self._encoder("trans_v_early", cfg.attn_dropout, 3, False)
        self.trans_a_early = self._encoder("trans_a_early", cfg.attn_dropout, 3, False)
        # Sequence-length reduction to reduced_dim (ref: mmtr.py:391-393).
        proj = lambda name: nn.Dense(
            cfg.reduced_dim, use_bias=False, dtype=dt,
            kernel_init=nn.initializers.lecun_normal(), name=name)
        self.proj_l_e = proj("proj_l_e")
        self.proj_v_e = proj("proj_v_e")
        self.proj_a_e = proj("proj_a_e")
        # Corrected sizing: inputs are hidden_sz summaries (SURVEY.md §0.1).
        self.gmu_early = GatedNModalLayer(3, cfg.hidden_sz, dt, name="gmu_early")

    # -- forward helpers -------------------------------------------------------

    def _dropout(self, x, rate, deterministic):
        if rate <= 0.0 or deterministic:
            return x
        from bpx.ops.dropout import hash_dropout
        return hash_dropout(x, rate, self.make_rng("dropout"))

    def _encode_streams(self, txt, mask, segment, video, audio,
                        deterministic):
        """BERT + audio encoder + feature projections + static padding.

        (ref: mmtr.py:448-469)
        """
        cfg = self.config
        dt = self._dtype()
        x_l = self.bert(txt, mask, segment, deterministic=deterministic)
        x_l = self._dropout(x_l.astype(dt), cfg.embed_dropout, deterministic)
        x_v = video.astype(dt)
        if cfg.use_audio_encoder:
            x_a = self.audio_enc(audio.astype(dt))
        else:
            x_a = audio.astype(dt)

        # Conv1d(k=1, bias-free) projections lower to Dense; applied only
        # when dims differ (ref: mmtr.py:456-458).
        proj_l = x_l if cfg.orig_d_l == cfg.hidden_sz else self.proj_l(x_l)
        proj_a = x_a if cfg.orig_d_a == cfg.hidden_sz else self.proj_a(x_a)
        proj_v = x_v if cfg.orig_d_v == cfg.hidden_sz else self.proj_v(x_v)

        proj_l = _pad_to_length(proj_l, cfg.num_vectors_l)
        proj_a = _pad_to_length(proj_a, cfg.num_vectors_a)
        proj_v = _pad_to_length(proj_v, cfg.num_vectors_v)
        return proj_l, proj_v, proj_a

    def _hybrid_summary(self, proj_l, proj_v, proj_a, deterministic):
        """Early-fusion branch: low-rank per-modality self-transformers and a
        3-ary GMU over first+last-token summaries (ref: mmtr.py:473-483)."""
        # Sequence-axis reduction: (B, T, E) -> (B, reduced_dim, E).
        red = lambda proj, x: jnp.swapaxes(proj(jnp.swapaxes(x, 1, 2)), 1, 2)
        h_l = self.trans_l_early(red(self.proj_l_e, proj_l),
                                 deterministic=deterministic)
        h_a = self.trans_a_early(red(self.proj_a_e, proj_a),
                                 deterministic=deterministic)
        h_v = self.trans_v_early(red(self.proj_v_e, proj_v),
                                 deterministic=deterministic)
        summary = lambda h: h[:, 0] + h[:, -1]
        fused, _ = self.gmu_early([summary(h_l), summary(h_v), summary(h_a)])
        return fused

    def _first_round(self, proj_l, proj_v, proj_a, deterministic):
        """The 6 first-round crossmodal transformers (ref: mmtr.py:489-498)."""
        det = deterministic
        if self.config.group_encoders:
            return self._first_round_grouped(proj_l, proj_v, proj_a, det)
        h_v_with_as = self.trans_v_with_a(proj_v, proj_a, proj_a, deterministic=det)
        h_a_with_vs = self.trans_a_with_v(proj_a, proj_v, proj_v, deterministic=det)
        h_v_with_ls = self.trans_v_with_l(proj_v, proj_l, proj_l, deterministic=det)
        h_l_with_vs = self.trans_l_with_v(proj_l, proj_v, proj_v, deterministic=det)
        h_a_with_ls = self.trans_a_with_l(proj_a, proj_l, proj_l, deterministic=det)
        h_l_with_as = self.trans_l_with_a(proj_l, proj_a, proj_a, deterministic=det)
        return (h_v_with_as, h_a_with_vs, h_v_with_ls, h_l_with_vs,
                h_a_with_ls, h_l_with_as)

    @staticmethod
    def _fuse_target(bi1, bi2, t1, t2, gmu_m, gmu_top, flip=False):
        """Middle GMU + level-1->2 residuals + top GMU + level-1->3 residual +
        first+last-token summary, for one target modality.

        ``t1``/``t2`` are the (length-adapted) first-round streams that
        ``bi1``/``bi2`` attended into; each biprojection adds its own stream
        as the level-1->2 residual (ref: mmtr.py:512-513,535-536,558-559).
        ``flip=True`` reproduces target L's reversed GMU argument order
        (ref: mmtr.py:509,516 pass (t_v, t_a) / (tot_a2v, tot_v2a), whereas
        targets A and V at mmtr.py:532,539,555,562 use the direct order) —
        the GMU slots are asymmetric weights, so the order is part of the
        trained function.
        """
        h_gmu, _ = (gmu_m(t2, t1) if flip else gmu_m(t1, t2))
        tot1 = bi1 + t1
        tot2 = bi2 + t2
        h_top, _ = (gmu_top(tot2, tot1) if flip else gmu_top(tot1, tot2))
        h_top = h_top + h_gmu
        return h_top[:, 0] + h_top[:, -1]

    def _head(self, last_hs, deterministic):
        """Residual MLP head (ref: mmtr.py:577-583)."""
        h = jax.nn.relu(self.proj1(last_hs))
        h = self._dropout(h, self.config.out_dropout, deterministic)
        h = self.proj2(h)
        return self.out_layer(h + last_hs)


class BPMulTVAPT(_BPMulTBase):
    """``mmtrvapt`` — BPMulT with video, audio, poster, text
    (ref: mmtr.py:277-583)."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        dt = self._dtype()
        assert cfg.lonly and cfg.vonly and cfg.aonly, \
            "BPMulT requires all three target modalities active " \
            "(the reference's partial paths crash at fusion, mmtr.py:571-574)"
        assert cfg.num_vectors_a == cfg.num_vectors_v, \
            "mmtrvapt assumes num_vectors_a == num_vectors_v (the reference " \
            "passes v-length streams into a/v GMUs untransformed, mmtr.py:531,554)"
        assert cfg.fusion == "gmu", \
            "fusion='mag' is only wired on mmtrvat (MAG takes exactly " \
            "text/visual/acoustic; the 4-input poster path has no " \
            "reference-sanctioned MAG wiring)"

        remat_bert = cfg.remat if cfg.remat_bert is None else cfg.remat_bert
        self.bert = BertEncoder(cfg.bert, dtype=dt, scan_layers=cfg.scan_layers,
                                remat=remat_bert,
                                attention_impl=(cfg.bert_attention_impl
                                                or cfg.attention_impl),
                                scan_unroll=cfg.scan_unroll,
                                # Default remat_policy_bert=None keeps BERT on
                                # full recompute (save_attn overflows HBM by
                                # 510 MB at batch 64 / accum 1); micro-batched
                                # steps can opt in via remat_policy_bert.
                                remat_policy=cfg.remat_policy_bert,
                                name="bert")
        if cfg.use_audio_encoder:
            self.audio_enc = make_audio_encoder(
                cfg.audio_encoder, cfg.orig_d_a, cfg.num_vectors_a, dt)

        dense_nb = lambda feat, name: nn.Dense(
            feat, use_bias=False, dtype=dt,
            kernel_init=nn.initializers.lecun_normal(), name=name)
        if cfg.orig_d_l != cfg.hidden_sz:
            self.proj_l = dense_nb(cfg.hidden_sz, "proj_l")
        if cfg.orig_d_v != cfg.hidden_sz:
            self.proj_v = dense_nb(cfg.hidden_sz, "proj_v")
        if cfg.orig_d_a != cfg.hidden_sz:
            self.proj_a = dense_nb(cfg.hidden_sz, "proj_a")
        self.proj_poster = dense_nb(cfg.hidden_sz, "proj_poster")

        self._make_crossmodal_mesh(biprojection_second_round=True)
        self._make_gmus()

        # Sequence-length adapters (ref: mmtr.py:380-383).
        self.transfm_a2l = SeqAdapter(cfg.num_vectors_l, dt, name="transfm_a2l")
        self.transfm_v2l = SeqAdapter(cfg.num_vectors_l, dt, name="transfm_v2l")
        self.transfm_l2a = SeqAdapter(cfg.num_vectors_a, dt, name="transfm_l2a")
        self.transfm_l2v = SeqAdapter(cfg.num_vectors_v, dt, name="transfm_l2v")

        n_final = 5 if cfg.hybrid else 4
        self.gmu = GatedNModalLayer(n_final, cfg.hidden_sz, self._dtype(),
                                    name="gmu")
        if cfg.hybrid:
            self._make_hybrid()
        self._make_head()

    def __call__(self, txt, mask, segment, video, audio, poster,
                 deterministic: bool = True, output_gates: bool = False):
        cfg = self.config
        proj_l, proj_v, proj_a = self._encode_streams(
            txt, mask, segment, video, audio, deterministic)

        if cfg.hybrid:
            last_h_early = self._hybrid_summary(proj_l, proj_v, proj_a,
                                                deterministic)

        poster_h = self.proj_poster(poster.astype(self._dtype()))

        (h_v_with_as, h_a_with_vs, h_v_with_ls, h_l_with_vs,
         h_a_with_ls, h_l_with_as) = self._first_round(
            proj_l, proj_v, proj_a, deterministic)

        det = deterministic
        if cfg.group_encoders:
            (h_l_v2a, h_l_a2v, h_a_v2l, h_a_l2v, h_v_a2l, h_v_l2a) = \
                self._second_round_grouped(
                    proj_l, proj_v, proj_a, h_v_with_as, h_a_with_vs,
                    h_v_with_ls, h_l_with_vs, h_a_with_ls, h_l_with_as, det)
        else:
            # Target L (ref: mmtr.py:501-522); A (524-545); V (547-568).
            h_l_v2a = self.trans_l_with_v2a(proj_l, h_a_with_vs, h_a_with_vs,
                                            deterministic=det)
            h_l_a2v = self.trans_l_with_a2v(proj_l, h_v_with_as, h_v_with_as,
                                            deterministic=det)
            h_a_v2l = self.trans_a_with_v2l(proj_a, h_l_with_vs, h_l_with_vs,
                                            deterministic=det)
            h_a_l2v = self.trans_a_with_l2v(proj_a, h_v_with_ls, h_v_with_ls,
                                            deterministic=det)
            h_v_a2l = self.trans_v_with_a2l(proj_v, h_l_with_as, h_l_with_as,
                                            deterministic=det)
            h_v_l2a = self.trans_v_with_l2a(proj_v, h_a_with_ls, h_a_with_ls,
                                            deterministic=det)

        # Target L: both first-round streams length-adapted to num_vectors_l.
        t_h_a_with_vs = self.transfm_a2l(h_a_with_vs)
        t_h_v_with_as = self.transfm_v2l(h_v_with_as)
        last_h_l = self._fuse_target(h_l_v2a, h_l_a2v,
                                     t_h_a_with_vs, t_h_v_with_as,
                                     self.gmu_l_m, self.gmu_l, flip=True)

        # Target A: the l-stream adapted to num_vectors_a, v passes through.
        t_h_l_with_vs = self.transfm_l2a(h_l_with_vs)
        last_h_a = self._fuse_target(h_a_v2l, h_a_l2v,
                                     t_h_l_with_vs, h_v_with_ls,
                                     self.gmu_a_m, self.gmu_a)

        # Target V.
        t_h_l_with_as = self.transfm_l2v(h_l_with_as)
        last_h_v = self._fuse_target(h_v_a2l, h_v_l2a,
                                     t_h_l_with_as, h_a_with_ls,
                                     self.gmu_v_m, self.gmu_v)

        inputs = [last_h_l, last_h_v, last_h_a, poster_h]
        if cfg.hybrid:
            inputs.append(last_h_early)
        last_hs, z = self.gmu(inputs)

        logits = self._head(last_hs, deterministic)
        if output_gates:
            return logits, z
        return logits


class BPMulTVAT(_BPMulTBase):
    """``mmtrvat`` — BPMulT with video, audio, text (ref: mmtr.py:587-866).

    Differences from the 4-input model, per the reference: audio is used raw
    (no conv encoder, ref: mmtr.py:743-744), there is no poster input, all
    stream lengths are equal so the length adapters are identity passthroughs
    (ref: mmtr.py:794-795,816-817,838-839), the second-round encoders are
    plain crossmodal (not biprojection) and the final fusion is a 3-ary GMU
    (corrected arity — see module docstring).
    """

    config: ModelConfig

    def setup(self):
        cfg = self.config
        dt = self._dtype()
        assert cfg.lonly and cfg.vonly and cfg.aonly
        assert cfg.num_vectors_l == cfg.num_vectors_a == cfg.num_vectors_v, \
            "mmtrvat uses identity length adapters; stream lengths must match " \
            "(ref: mmtr.py:664-670)"

        remat_bert = cfg.remat if cfg.remat_bert is None else cfg.remat_bert
        self.bert = BertEncoder(cfg.bert, dtype=dt, scan_layers=cfg.scan_layers,
                                remat=remat_bert,
                                attention_impl=(cfg.bert_attention_impl
                                                or cfg.attention_impl),
                                scan_unroll=cfg.scan_unroll,
                                # See mmtrvapt: full recompute by default,
                                # opt-in save_attn under micro-batching.
                                remat_policy=cfg.remat_policy_bert,
                                name="bert")
        dense_nb = lambda feat, name: nn.Dense(
            feat, use_bias=False, dtype=dt,
            kernel_init=nn.initializers.lecun_normal(), name=name)
        if cfg.orig_d_l != cfg.hidden_sz:
            self.proj_l = dense_nb(cfg.hidden_sz, "proj_l")
        if cfg.orig_d_v != cfg.hidden_sz:
            self.proj_v = dense_nb(cfg.hidden_sz, "proj_v")
        if cfg.orig_d_a != cfg.hidden_sz:
            self.proj_a = dense_nb(cfg.hidden_sz, "proj_a")

        self._make_crossmodal_mesh(biprojection_second_round=False)
        self._make_gmus()

        if cfg.fusion == "mag":
            # MAG substitutes the final GMU (ref: mmtr.py:10 "tries to
            # substitute the GMU module", dead call sites mmtr.py:355-358;
            # beta_shift/dropout from the commented defaults at 356).
            assert not cfg.hybrid, "fusion='mag' is incompatible with hybrid"
            from bpx.ops.mag import MAG
            self.mag = MAG(cfg.hidden_sz, beta_shift=1e-3, dropout_prob=0.5,
                           dtype=dt, name="mag")
        else:
            n_final = 4 if cfg.hybrid else 3
            self.gmu = GatedNModalLayer(n_final, cfg.hidden_sz, dt,
                                        name="gmu")
        if cfg.hybrid:
            self._make_hybrid()
        self._make_head()

    def __call__(self, txt, mask, segment, video, audio,
                 deterministic: bool = True, output_gates: bool = False):
        cfg = self.config
        proj_l, proj_v, proj_a = self._encode_streams(
            txt, mask, segment, video, audio, deterministic)

        if cfg.hybrid:
            last_h_early = self._hybrid_summary(proj_l, proj_v, proj_a,
                                                deterministic)

        (h_v_with_as, h_a_with_vs, h_v_with_ls, h_l_with_vs,
         h_a_with_ls, h_l_with_as) = self._first_round(
            proj_l, proj_v, proj_a, deterministic)

        det = deterministic
        # Second round + fusion; all adapters identity (equal lengths).
        if cfg.group_encoders:
            (h_l_v2a, h_l_a2v, h_a_v2l, h_a_l2v, h_v_a2l, h_v_l2a) = \
                self._second_round_grouped(
                    proj_l, proj_v, proj_a, h_v_with_as, h_a_with_vs,
                    h_v_with_ls, h_l_with_vs, h_a_with_ls, h_l_with_as, det)
        else:
            h_l_v2a = self.trans_l_with_v2a(proj_l, h_a_with_vs, h_a_with_vs,
                                            deterministic=det)
            h_l_a2v = self.trans_l_with_a2v(proj_l, h_v_with_as, h_v_with_as,
                                            deterministic=det)
            h_a_v2l = self.trans_a_with_v2l(proj_a, h_l_with_vs, h_l_with_vs,
                                            deterministic=det)
            h_a_l2v = self.trans_a_with_l2v(proj_a, h_v_with_ls, h_v_with_ls,
                                            deterministic=det)
            h_v_a2l = self.trans_v_with_a2l(proj_v, h_l_with_as, h_l_with_as,
                                            deterministic=det)
            h_v_l2a = self.trans_v_with_l2a(proj_v, h_a_with_ls, h_a_with_ls,
                                            deterministic=det)
        last_h_l = self._fuse_target(h_l_v2a, h_l_a2v,
                                     h_a_with_vs, h_v_with_as,
                                     self.gmu_l_m, self.gmu_l, flip=True)
        last_h_a = self._fuse_target(h_a_v2l, h_a_l2v,
                                     h_l_with_vs, h_v_with_ls,
                                     self.gmu_a_m, self.gmu_a)
        last_h_v = self._fuse_target(h_v_a2l, h_v_l2a,
                                     h_l_with_as, h_a_with_ls,
                                     self.gmu_v_m, self.gmu_v)

        if cfg.fusion == "mag":
            last_hs, z = self.mag(last_h_l, last_h_v, last_h_a,
                                  deterministic=deterministic,
                                  return_alpha=True)
        else:
            inputs = [last_h_l, last_h_v, last_h_a]
            if cfg.hybrid:
                inputs.append(last_h_early)
            last_hs, z = self.gmu(inputs)

        logits = self._head(last_hs, deterministic)
        if output_gates:
            return logits, z
        return logits
