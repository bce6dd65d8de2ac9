"""Logging, seeding, checkpointing, artifacts."""

from bpx.utils.logging import create_logger
from bpx.utils.seeding import set_seed
