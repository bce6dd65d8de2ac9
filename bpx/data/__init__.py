"""Host-side data pipeline: tokenization, jsonl datasets, feature adapters,
static-shape batching, device prefetch."""

from bpx.data.vocab import Vocab
from bpx.data.tokenization import WordPieceTokenizer, build_tokenizer
from bpx.data.dataset import JsonlDataset
from bpx.data.loaders import get_data_loaders
