from .layer import (ManoModel, load_mano_model, load_mano_pair,  # noqa: F401
                    mano_forward, seal_verts_np)
