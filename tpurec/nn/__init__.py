from tpurec.nn.core import (
    BatchNorm,
    FeaturesLinear,
    FusedEmbedding,
    GateNN,
    Linear,
    MLP,
    StackedLinear,
    StackedMLP,
    activation,
)
from tpurec.nn.interactions import (
    AnovaKernel,
    AttentionalFactorizationMachine,
    CompressedInteractionNetwork,
    CrossNetMix,
    CrossNetV2,
    CrossNetwork,
    FactorizationMachine,
    FieldAttention,
    FieldMultiHeadAttention,
    InnerProductNetwork,
    OuterProductNetwork,
)
