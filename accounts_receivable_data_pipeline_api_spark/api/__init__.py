from .endpoints import ApiError, Endpoints

__all__ = ["ApiError", "Endpoints"]
