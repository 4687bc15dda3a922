"""ML library: the fv3fit analog, JAX-native.

Reference surface being matched (reference: external/fv3fit/fv3fit):
- ``Predictor`` protocol with ``input_variables``/``output_variables``
  and ``predict(Dataset) -> Dataset`` (_shared/predictor.py:44-90)
- ``dump``/``load`` serialization registry dispatching on a ``name`` file
  in the artifact directory (_shared/io.py:17-92)
- ``@register_training_function(name, HyperparamCls)`` trainer registry
  (_shared/training_config.py) with the ``dense`` trainer
  (keras/_models/dense.py:90) re-designed as a pure-JAX MLP + optax loop
- packers stacking named variables into [sample, feature] arrays
  (_shared/packer.py:52-182)

The compute path is pure JAX: model application is a jittable function of
a weight pytree, so predictors run *inside* the jitted time loop — unlike
the reference, which crosses into TF/sklearn per step.
"""
from fv3net_tpu.fit.predictor import Predictor  # noqa: F401
from fv3net_tpu.fit.io import register, dump, load  # noqa: F401
from fv3net_tpu.fit.train import (  # noqa: F401
    TrainingConfig,
    get_training_function,
    register_training_function,
)
from fv3net_tpu.fit import dense  # noqa: F401  (registers "dense")
from fv3net_tpu.fit import testing  # noqa: F401  (registers "constant-output")
from fv3net_tpu.fit import models  # noqa: F401  (registers wrapper models)
from fv3net_tpu.fit import novelty  # noqa: F401  (registers novelty detectors)
from fv3net_tpu.fit import convolutional  # noqa: F401  (registers "convolutional")
from fv3net_tpu.fit import random_forest  # noqa: F401  (registers "sklearn_random_forest")
from fv3net_tpu.fit import reservoir  # noqa: F401  (registers reservoir trainers)
from fv3net_tpu.fit import graph  # noqa: F401  (registers "graph")
from fv3net_tpu.fit import recurrent  # noqa: F401  (registers "fmr")
from fv3net_tpu.fit import cyclegan  # noqa: F401  (registers "cyclegan")
from fv3net_tpu.fit import precipitative  # noqa: F401  (registers "precipitative")
from fv3net_tpu.fit import autoencoder  # noqa: F401  (registers "dense_autoencoder")
from fv3net_tpu.fit import transformed  # noqa: F401  (registers "transformed")
from fv3net_tpu.fit.normalize import StandardScaler  # noqa: F401
from fv3net_tpu.fit.models import DerivedModel  # noqa: F401
from fv3net_tpu.fit.train import (  # noqa: F401
    get_hyperparameter_class,
    set_random_seed,
)
from fv3net_tpu.fit.jacobian import (  # noqa: F401
    compute_jacobians,
    nondimensionalize_jacobians,
)
from fv3net_tpu.fit.config import (  # noqa: F401
    LearningRateScheduleConfig,
    OptimizerConfig,
    OutputLimit,
    OutputLimitConfig,
    RegularizerConfig,
)
from fv3net_tpu.fit.networks import (  # noqa: F401
    ConvolutionalNetwork,
    ConvolutionalNetworkConfig,
    DenseNetwork,
    DenseNetworkConfig,
    EpochResult,
    LossConfig,
    TrainingLoopConfig,
)
from fv3net_tpu.fit.input_sensitivity import (  # noqa: F401
    InputSensitivity,
    JacobianInputSensitivity,
    RandomForestInputSensitivities,
    RandomForestInputSensitivity,
    input_sensitivity,
)
from fv3net_tpu.fit.data import (  # noqa: F401
    FromBatches,
    SyntheticNoise,
    TFDatasetLoader,
    WindowedZarrLoader,
    register_tfdataset_loader,
    tfdataset_loader_from_dict,
)
from fv3net_tpu.fit.dense import DenseHyperparameters  # noqa: F401
from fv3net_tpu.fit.convolutional import ConvolutionalHyperparameters  # noqa: F401
from fv3net_tpu.fit.transformed import TransformedPredictor  # noqa: F401
from fv3net_tpu.fit import transformers  # noqa: F401  (registers transformers)
from fv3net_tpu.fit.transformers import (  # noqa: F401
    DatasetPredictor,
    DoNothingAutoencoder,
    PCATransformer,
)
