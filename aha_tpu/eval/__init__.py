from aha_tpu.eval import grounding, grid_search, highlight, hisum, scoring, tvsum

__all__ = ["grounding", "grid_search", "highlight", "hisum", "scoring", "tvsum"]
