from .layer import ManoModel, load_mano_model, mano_forward, seal_verts_np  # noqa: F401
