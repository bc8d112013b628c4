"""Special-token constants shared across the model/data layers.

Behavioral parity with the reference token constants
(/root/reference/lhrs/models/__init__.py:1-6).
"""

CONTROLLER_HEART_BEAT_EXPIRATION = 30
WORKER_HEART_BEAT_INTERVAL = 15

IGNORE_INDEX = -100
IMAGE_TOKEN_INDEX = -200
DEFAULT_IMAGE_TOKEN = "<image>"
DEFAULT_IMAGE_PATCH_TOKEN = "<im_patch>"
DEFAULT_IM_START_TOKEN = "<im_start>"
DEFAULT_IM_END_TOKEN = "<im_end>"

# Number of LLM-space embeddings the perceiver produces per image.
NUM_IMAGE_TOKENS = 144
