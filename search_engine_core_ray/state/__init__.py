from .checkpoint import atomic_write_json, read_json, stage_marker_path, stage_done, mark_stage

__all__ = ["atomic_write_json", "read_json", "stage_marker_path", "stage_done", "mark_stage"]
