from pylate_spark.sources.synth import synth_pages, synth_pages_pandas, synth_queries

__all__ = ["synth_pages", "synth_pages_pandas", "synth_queries"]
