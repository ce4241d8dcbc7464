from ribca_tpu.api.annotator import Annotator

__all__ = ["Annotator"]


def __getattr__(name):
    # lazy: the server pulls in the full pipeline stack
    if name in ("serve", "submit_job", "run_job"):
        from ribca_tpu.api import server

        return getattr(server, name)
    raise AttributeError(name)
