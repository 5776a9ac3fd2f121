from . import dedup, multimodal, similarity, textstats, windows
