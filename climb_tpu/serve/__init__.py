from climb_tpu.serve.export import ExportedModel, export_eval_step

__all__ = ["ExportedModel", "export_eval_step"]
