"""Compute primitives: attention, positions, masks, GMUs, encoders, BERT."""

from bpx.ops.positions import sinusoidal_table, positional_embedding
from bpx.ops.masks import offset_future_mask
from bpx.ops.attention import MultiheadAttention
from bpx.ops.encoder import TransformerEncoder, TransformerEncoderLayer
from bpx.ops.gmu import (
    GatedBimodalLayer,
    GatedBimodalFusionLayer,
    GatedNModalLayer,
)
