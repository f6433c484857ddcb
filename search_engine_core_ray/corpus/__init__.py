from .synth import synth_pages_table, SynthConfig

__all__ = ["synth_pages_table", "SynthConfig"]
