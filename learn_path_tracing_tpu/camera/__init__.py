from .camera import (Camera, CameraParams, LegacyCamera, generate_rays, rotation_matrix)

__all__ = ["Camera", "CameraParams", "generate_rays", "rotation_matrix"]
