from tinygpt_tpu.server.http import ServerConfig, TinyGPTServer, main

__all__ = ["TinyGPTServer", "ServerConfig", "main"]
