from climb_tpu.serve.export import ExportedModel, export_eval_step

__all__ = ["ExportedModel", "export_eval_step"]


def __getattr__(name):
    # lazy: keep `import climb_tpu.serve` free of the http/server deps so
    # the no-model-code-at-serve-time import-set test stays minimal
    if name in ("create_server", "InferenceService", "RequestBatcher"):
        from climb_tpu.serve import server

        return getattr(server, name)
    raise AttributeError(name)
