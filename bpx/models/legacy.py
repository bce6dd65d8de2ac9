"""Earlier-generation models from the reference's demo notebooks
(SURVEY.md §2 C30) — the ancestors of BPMulT, kept for capability parity and
as comparison baselines:

* :class:`MulTGMUClf` (``mmtrvpa``) — MulT-style: 6 crossmodal transformers,
  per-target concat of the two crossed streams, a 2E-wide self-attention
  "memory" transformer, last-token summary, 3-ary GMU late fusion
  (ref: DEMO_BPMultimodal_Transformer.ipynb cell 48 ``MMTransformerGMUClf``).
* :class:`TranslatingMMTGMUClf` (``tmmtrvpa``) — the single-projection
  ancestor of BPMulT: one crossmodal round + a second round of plain
  crossmodal encoders into the crossed streams, middle/top Fusion-GMUs with
  the level-1->2 residuals, last-token summary, 3-ary GMU
  (ref: same notebook cell 52 ``TranslatingMMTransformerGMUClf``).
* :class:`GMUClf` / :class:`GMUBimodalClf` — simple GMU late-fusion
  classifiers over [CLS]-pooled text + mean-pooled streams, with selectable
  gate variant original/hierarchical/softmax
  (ref: DEMO_GMUs_proposals…ipynb cells 56-57).

All share the bpx conventions: batch-first, time-major/feature-last inputs,
static stream lengths, gate outputs for interpretability.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from bpx.config import ModelConfig
from bpx.models.bpmult import _BPMulTBase, SeqAdapter, _pad_to_length
from bpx.ops.bert import BertEncoder
from bpx.ops.audio import make_audio_encoder
from bpx.ops.gmu import (
    GatedBimodalFusionLayer,
    GatedBimodalLayer,
    GatedHierarchicalLayer,
    GatedNModalLayer,
    GatedSoftmaxLayer,
)


class MulTGMUClf(_BPMulTBase):
    """``mmtrvpa`` — MulT + GMU late fusion (notebook cell 48)."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        dt = self._dtype()
        remat_bert = cfg.remat if cfg.remat_bert is None else cfg.remat_bert
        self.bert = BertEncoder(cfg.bert, dtype=dt, scan_layers=cfg.scan_layers,
                                remat=remat_bert,
                                attention_impl=(cfg.bert_attention_impl
                                                or cfg.attention_impl),
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

        enc = self._encoder
        self.trans_l_with_a = enc("trans_l_with_a", cfg.attn_dropout_a, -1, False)
        self.trans_l_with_v = enc("trans_l_with_v", cfg.attn_dropout_v, -1, False)
        self.trans_v_with_l = enc("trans_v_with_l", cfg.attn_dropout, -1, False)
        self.trans_v_with_a = enc("trans_v_with_a", cfg.attn_dropout_a, -1, False)
        self.trans_a_with_l = enc("trans_a_with_l", cfg.attn_dropout, -1, False)
        self.trans_a_with_v = enc("trans_a_with_v", cfg.attn_dropout_v, -1, False)

        # 2E-wide memory transformers (notebook get_network *_mem branch),
        # depth max(layers, 3).
        from bpx.ops.encoder import TransformerEncoder
        mem = lambda name: TransformerEncoder(
            embed_dim=2 * cfg.hidden_sz, num_heads=cfg.num_heads,
            layers=max(cfg.layers, 3), attn_dropout=cfg.attn_dropout,
            relu_dropout=cfg.relu_dropout, res_dropout=cfg.res_dropout,
            embed_dropout=cfg.embed_dropout, attn_mask=cfg.attn_mask,
            dtype=self._dtype(), attention_impl=cfg.attention_impl,
            name=name)
        self.trans_l_mem = mem("trans_l_mem")
        self.trans_v_mem = mem("trans_v_mem")
        self.trans_a_mem = mem("trans_a_mem")

        self.gmu = GatedNModalLayer(3, cfg.hidden_sz, dt, name="gmu")
        self._make_head()

    def __call__(self, txt, mask, segment, video, audio,
                 deterministic: bool = True, output_gates: bool = False):
        det = deterministic
        proj_l, proj_v, proj_a = self._encode_streams(
            txt, mask, segment, video, audio, det)

        h_l_with_as = self.trans_l_with_a(proj_l, proj_a, proj_a, deterministic=det)
        h_l_with_vs = self.trans_l_with_v(proj_l, proj_v, proj_v, deterministic=det)
        h_ls = self.trans_l_mem(
            jnp.concatenate([h_l_with_as, h_l_with_vs], axis=-1),
            deterministic=det)
        last_h_l = h_ls[:, -1]

        h_a_with_ls = self.trans_a_with_l(proj_a, proj_l, proj_l, deterministic=det)
        h_a_with_vs = self.trans_a_with_v(proj_a, proj_v, proj_v, deterministic=det)
        h_as = self.trans_a_mem(
            jnp.concatenate([h_a_with_ls, h_a_with_vs], axis=-1),
            deterministic=det)
        last_h_a = h_as[:, -1]

        h_v_with_ls = self.trans_v_with_l(proj_v, proj_l, proj_l, deterministic=det)
        h_v_with_as = self.trans_v_with_a(proj_v, proj_a, proj_a, deterministic=det)
        h_vs = self.trans_v_mem(
            jnp.concatenate([h_v_with_ls, h_v_with_as], axis=-1),
            deterministic=det)
        last_h_v = h_vs[:, -1]

        # Notebook fuses the 2E-dim summaries with a 3-ary GMU sized
        # (2E,2E,2E)->E; the corrected N-ary layer handles the 2E inputs.
        last_hs, z = self.gmu([last_h_l, last_h_v, last_h_a])
        logits = self._head(last_hs, det)
        if output_gates:
            return logits, z
        return logits


class TranslatingMMTGMUClf(_BPMulTBase):
    """``tmmtrvpa`` — Translating MMT + GMU, the pre-biprojection ancestor
    (notebook cell 52)."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        dt = self._dtype()
        assert cfg.num_vectors_a == cfg.num_vectors_v
        remat_bert = cfg.remat if cfg.remat_bert is None else cfg.remat_bert
        self.bert = BertEncoder(cfg.bert, dtype=dt, scan_layers=cfg.scan_layers,
                                remat=remat_bert,
                                attention_impl=(cfg.bert_attention_impl
                                                or cfg.attention_impl),
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

        # Second round is PLAIN crossmodal here (no biprojection sublayer).
        if self.config.group_encoders:
            # the grouped mesh only builds the vmapped pair modules; this
            # model's second round addresses the ungrouped trans_* stacks
            # directly (and grouping measured slower anyway, PERF.md)
            raise ValueError("group_encoders is not supported for "
                             "tmmtrvpa; use group_encoders=False")
        self._make_crossmodal_mesh(biprojection_second_round=False)
        self._make_gmus()
        self.transfm_a2l = SeqAdapter(cfg.num_vectors_l, dt, name="transfm_a2l")
        self.transfm_v2l = SeqAdapter(cfg.num_vectors_l, dt, name="transfm_v2l")
        self.transfm_l2a = SeqAdapter(cfg.num_vectors_a, dt, name="transfm_l2a")
        self.transfm_l2v = SeqAdapter(cfg.num_vectors_v, dt, name="transfm_l2v")
        self.gmu = GatedNModalLayer(3, cfg.hidden_sz, dt, name="gmu")
        self._make_head()

    def __call__(self, txt, mask, segment, video, audio,
                 deterministic: bool = True, output_gates: bool = False):
        det = deterministic
        proj_l, proj_v, proj_a = self._encode_streams(
            txt, mask, segment, video, audio, det)
        (h_v_with_as, h_a_with_vs, h_v_with_ls, h_l_with_vs,
         h_a_with_ls, h_l_with_as) = self._first_round(
            proj_l, proj_v, proj_a, det)

        def fuse(bi1, bi2, t1, t2, gmu_m, gmu_top, flip):
            # like BPMulT's _fuse_target but with last-token-only summary
            # (notebook: last_h = h[-1], no [CLS]+last sum)
            h_gmu, _ = (gmu_m(t2, t1) if flip else gmu_m(t1, t2))
            tot1, tot2 = bi1 + t1, bi2 + t2
            h_top, _ = (gmu_top(tot2, tot1) if flip else gmu_top(tot1, tot2))
            return (h_top + h_gmu)[:, -1]

        h_l_v2a = self.trans_l_with_v2a(proj_l, h_a_with_vs, h_a_with_vs,
                                        deterministic=det)
        h_l_a2v = self.trans_l_with_a2v(proj_l, h_v_with_as, h_v_with_as,
                                        deterministic=det)
        last_h_l = fuse(h_l_v2a, h_l_a2v, self.transfm_a2l(h_a_with_vs),
                        self.transfm_v2l(h_v_with_as),
                        self.gmu_l_m, self.gmu_l, flip=True)

        h_a_v2l = self.trans_a_with_v2l(proj_a, h_l_with_vs, h_l_with_vs,
                                        deterministic=det)
        h_a_l2v = self.trans_a_with_l2v(proj_a, h_v_with_ls, h_v_with_ls,
                                        deterministic=det)
        last_h_a = fuse(h_a_v2l, h_a_l2v, self.transfm_l2a(h_l_with_vs),
                        h_v_with_ls, self.gmu_a_m, self.gmu_a, flip=False)

        h_v_a2l = self.trans_v_with_a2l(proj_v, h_l_with_as, h_l_with_as,
                                        deterministic=det)
        h_v_l2a = self.trans_v_with_l2a(proj_v, h_a_with_ls, h_a_with_ls,
                                        deterministic=det)
        last_h_v = fuse(h_v_a2l, h_v_l2a, self.transfm_l2v(h_l_with_as),
                        h_a_with_ls, self.gmu_v_m, self.gmu_v, flip=False)

        last_hs, z = self.gmu([last_h_l, last_h_v, last_h_a])
        logits = self._head(last_hs, det)
        if output_gates:
            return logits, z
        return logits


class GMUClf(_BPMulTBase):
    """Simple trimodal GMU late-fusion classifier (DEMO_GMUs cell 56):
    [CLS]-pooled text + mean-pooled projected streams -> 3-ary GMU
    (variant original/hierarchical/softmax via ``gmu_variant``) -> linear."""

    config: ModelConfig
    gmu_variant: str = "original"

    def setup(self):
        cfg = self.config
        dt = self._dtype()
        remat_bert = cfg.remat if cfg.remat_bert is None else cfg.remat_bert
        self.bert = BertEncoder(cfg.bert, dtype=dt, with_pooler=True,
                                scan_layers=cfg.scan_layers, remat=remat_bert,
                                attention_impl=(cfg.bert_attention_impl
                                                or cfg.attention_impl),
                                name="bert")
        if cfg.use_audio_encoder:
            self.audio_enc = make_audio_encoder(
                cfg.audio_encoder, cfg.orig_d_a, cfg.num_vectors_a, dt)
        dense_nb = lambda feat, name: nn.Dense(
            feat, use_bias=False, dtype=dt,
            kernel_init=nn.initializers.lecun_normal(), name=name)
        if cfg.orig_d_v != cfg.hidden_sz:
            self.proj_v = dense_nb(cfg.hidden_sz, "proj_v")
        if cfg.orig_d_a != cfg.hidden_sz:
            self.proj_a = dense_nb(cfg.hidden_sz, "proj_a")
        if self.gmu_variant == "original":
            self.gmu = GatedNModalLayer(3, cfg.hidden_sz, dt, name="gmu")
        elif self.gmu_variant == "hierarchical":
            self.gmu = GatedHierarchicalLayer(cfg.hidden_sz, dt, name="gmu")
        elif self.gmu_variant == "softmax":
            self.gmu = GatedSoftmaxLayer(cfg.hidden_sz, dt, name="gmu")
        else:
            raise ValueError(self.gmu_variant)
        self.out_layer = nn.Dense(cfg.n_classes, dtype=dt, name="out_layer")

    def __call__(self, txt, mask, segment, video, audio,
                 deterministic: bool = True, output_gates: bool = False):
        cfg = self.config
        dt = self._dtype()
        _, pooled = self.bert(txt, mask, segment, deterministic=deterministic)
        x_v = video.astype(dt)
        x_a = (self.audio_enc(audio.astype(dt)) if cfg.use_audio_encoder
               else audio.astype(dt))
        if cfg.orig_d_v != cfg.hidden_sz:
            x_v = self.proj_v(x_v)
        if cfg.orig_d_a != cfg.hidden_sz:
            x_a = self.proj_a(x_a)
        tok_v = jnp.mean(x_v, axis=1)
        tok_a = jnp.mean(x_a, axis=1)
        if self.gmu_variant == "original":
            last_hs, z = self.gmu([pooled, tok_v, tok_a])
        else:
            last_hs, z = self.gmu(pooled, tok_v, tok_a)
        logits = self.out_layer(last_hs)
        if output_gates:
            return logits, z
        return logits


class GMUBimodalClf(_BPMulTBase):
    """Bimodal (text + video) GMU classifier (DEMO_GMUs cell 57)."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        dt = self._dtype()
        remat_bert = cfg.remat if cfg.remat_bert is None else cfg.remat_bert
        self.bert = BertEncoder(cfg.bert, dtype=dt, with_pooler=True,
                                scan_layers=cfg.scan_layers, remat=remat_bert,
                                attention_impl=(cfg.bert_attention_impl
                                                or cfg.attention_impl),
                                name="bert")
        if cfg.orig_d_v != cfg.hidden_sz:
            self.proj_v = nn.Dense(
                cfg.hidden_sz, use_bias=False, dtype=dt,
                kernel_init=nn.initializers.lecun_normal(), name="proj_v")
        self.gmu = GatedBimodalLayer(cfg.hidden_sz, dt, name="gmu")
        self.out_layer = nn.Dense(cfg.n_classes, dtype=dt, name="out_layer")

    def __call__(self, txt, mask, segment, video,
                 deterministic: bool = True, output_gates: bool = False):
        cfg = self.config
        _, pooled = self.bert(txt, mask, segment, deterministic=deterministic)
        x_v = video.astype(self._dtype())
        if cfg.orig_d_v != cfg.hidden_sz:
            x_v = self.proj_v(x_v)
        last_hs, z = self.gmu(pooled, jnp.mean(x_v, axis=1))
        logits = self.out_layer(last_hs)
        if output_gates:
            return logits, z
        return logits


class BertClf(_BPMulTBase):
    """``bertclf`` — the text-only BERT baseline both demo notebooks anchor
    their comparison tables on (ref: DEMO_BPMultimodal_Transformer.ipynb
    cell 36 ``BertClf``, registered as ``"bert"`` in the cell-54 MODELS
    dict; DEMO_GMUs cell 68 outputs).

    Pooler output (tanh(W h[CLS])) -> one Dense to ``n_classes`` — exactly
    the notebook graph.  Has no gates; with ``output_gates`` it returns a
    width-0 gate array so the interpretability channel stays shape-stable.
    """

    config: ModelConfig

    def setup(self):
        cfg = self.config
        dt = self._dtype()
        remat_bert = cfg.remat if cfg.remat_bert is None else cfg.remat_bert
        self.bert = BertEncoder(cfg.bert, dtype=dt, with_pooler=True,
                                scan_layers=cfg.scan_layers, remat=remat_bert,
                                attention_impl=(cfg.bert_attention_impl
                                                or cfg.attention_impl),
                                name="bert")
        self.clf = nn.Dense(cfg.n_classes, dtype=dt, name="clf")

    def __call__(self, txt, mask, segment,
                 deterministic: bool = True, output_gates: bool = False):
        _, pooled = self.bert(txt, mask, segment, deterministic=deterministic)
        logits = self.clf(pooled)
        if output_gates:
            return logits, jnp.zeros((logits.shape[0], 0), logits.dtype)
        return logits
