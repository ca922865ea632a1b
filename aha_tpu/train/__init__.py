from aha_tpu.train import losses, lora, optimizer, trainer

__all__ = ["losses", "lora", "optimizer", "trainer"]
