from rlap_tpu.objectives.contrast import (  # noqa: F401
    DualBranchContrast, infonce, infonce_batched, jsd, bootstrap_latent,
    same_scale_masks, cross_scale_masks_batched, cosine_similarity_matrix)
from rlap_tpu.objectives.cca import cca_ssg_loss  # noqa: F401
