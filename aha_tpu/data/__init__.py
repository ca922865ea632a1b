from aha_tpu.data import collator, conversations, datasets, media

__all__ = ["collator", "conversations", "datasets", "media"]
