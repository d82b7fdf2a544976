from .camera import Camera, CameraParams, generate_rays, rotation_matrix

__all__ = ["Camera", "CameraParams", "generate_rays", "rotation_matrix"]
