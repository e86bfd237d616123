from uegan_tpu.serve.app import create_server, run_server

__all__ = ["create_server", "run_server"]
