from aha_tpu.drivers import benchmarks, eval_dataset

__all__ = ["benchmarks", "eval_dataset"]
