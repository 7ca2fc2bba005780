from rlap_tpu.models.grace import GRACE, GraceTrainer  # noqa: F401
from rlap_tpu.models.mvgrl import MVGRL, MVGRLTrainer  # noqa: F401
from rlap_tpu.models.graphcl import GraphCL, GraphCLTrainer  # noqa: F401
from rlap_tpu.models.bgrl import BGRL, BGRLTrainer  # noqa: F401
from rlap_tpu.models.cca_ssg import CCASSG, CCASSGTrainer  # noqa: F401
