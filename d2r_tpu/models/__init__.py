from d2r_tpu.models.unimo import D2RClassifier, D2RModel  # noqa: F401
from d2r_tpu.models.interaction import DynamicRoutingLayer, InteractionModule  # noqa: F401
