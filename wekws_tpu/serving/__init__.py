from wekws_tpu.serving.server import KwsServer
from wekws_tpu.serving.client import KwsClient

__all__ = ["KwsServer", "KwsClient"]
