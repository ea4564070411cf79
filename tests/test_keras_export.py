"""Deployment bridge: the TPU-trained supernet slices realized as a
concrete Keras model (and TFLite) must reproduce our eval-mode forward.

This is transplant parity, not architecture parity (the Keras oracle test
covers that): same trained weights, two independent runtimes, same
predictions."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from cmoop_audio_processing_tpu.core.config import DataConfig, TrainConfig
from cmoop_audio_processing_tpu.data.pipeline import prepare_dataset
from cmoop_audio_processing_tpu.engine.export import (
    load_model,
    predict,
    save_model,
    train_single,
)
from cmoop_audio_processing_tpu.models.keras_export import (
    build_keras_model,
    export_keras,
    export_tflite,
    transplant_weights,
)

GENOMES = [
    ("A", dict(filters=16, kernel_size=3, use_bn=True, residual_blocks=2,
               fc_layers=2, use_dropout=True)),
    ("A", dict(filters=16, kernel_size=5, use_bn=False, residual_blocks=1,
               fc_layers=4, use_dropout=False)),
    ("B", dict(filters=16, kernel_size=3, use_bn=True, residual_blocks=3,
               fc_layers=1, use_dropout=False)),
]


@pytest.fixture(scope="module")
def data():
    return prepare_dataset(
        DataConfig(synthetic_train=96, synthetic_eval=32, time_steps=12,
                   features=8, num_classes=4)
    )


def _softmax(z):
    e = np.exp(z - z.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


@pytest.mark.parametrize("template,genome", GENOMES)
def test_transplant_parity_with_our_forward(data, template, genome):
    cfg = TrainConfig(epochs=3, batch_size=32, patience=3, num_classes=4,
                      compute_dtype="float32", template=template)
    params, state, metrics = train_single(genome, data, cfg, seed=4)
    model = build_keras_model(genome, 4, data["x_val"].shape[1:3], template)
    transplant_weights(model, genome, params, state)

    from cmoop_audio_processing_tpu.models.supernet import BucketSpec

    spec = BucketSpec(template, genome["filters"], genome["kernel_size"], 4,
                      compute_dtype="float32",
                      max_blocks=genome["residual_blocks"])
    ours = _softmax(predict(spec, genome, params, state, data["x_val"]))
    keras = model.predict(data["x_val"], verbose=0)
    np.testing.assert_allclose(keras, ours, rtol=1e-4, atol=1e-5)
    tf.keras.backend.clear_session()


def test_transplant_parity_at_birdclef_shape():
    """Forward parity at the reference's second shape point: 5-s clips ->
    501x40 mel maps, 11 classes, template B (sa_nsga_penalty.py:38-102).
    The pooling cascade through the residual stack differs entirely from
    the small fixtures (501 -> 250 -> 125 -> 62 vs 12 -> 6 -> 3 -> 1), so
    any 'same'-padding / stride divergence between the supernet and Keras
    only shows up here."""
    data = prepare_dataset(
        DataConfig(synthetic_train=32, synthetic_eval=8, time_steps=501,
                   features=40, num_classes=11)
    )
    genome = dict(filters=32, kernel_size=5, use_bn=True, residual_blocks=3,
                  fc_layers=2, use_dropout=True)
    cfg = TrainConfig(epochs=1, batch_size=16, patience=1, num_classes=11,
                      compute_dtype="float32", template="B")
    params, state, _ = train_single(genome, data, cfg, seed=4)
    model = build_keras_model(genome, 11, data["x_val"].shape[1:3], "B")
    transplant_weights(model, genome, params, state)

    from cmoop_audio_processing_tpu.models.supernet import BucketSpec

    spec = BucketSpec("B", genome["filters"], genome["kernel_size"], 11,
                      compute_dtype="float32",
                      max_blocks=genome["residual_blocks"])
    ours = _softmax(predict(spec, genome, params, state, data["x_val"]))
    keras = model.predict(data["x_val"], verbose=0)
    np.testing.assert_allclose(keras, ours, rtol=1e-4, atol=1e-5)
    tf.keras.backend.clear_session()


def test_export_keras_and_tflite_roundtrip(tmp_path, data):
    template, genome = GENOMES[0]
    cfg = TrainConfig(epochs=2, batch_size=32, patience=2, num_classes=4,
                      compute_dtype="float32", template=template)
    params, state, metrics = train_single(genome, data, cfg, seed=4)
    mdir = str(tmp_path / "m")
    save_model(mdir, genome, cfg, params, state, metrics, seed=4,
               input_hw=data["x_val"].shape[1:3])

    keras_path = str(tmp_path / "m.keras")
    model = export_keras(mdir, keras_path)
    reloaded = tf.keras.models.load_model(keras_path)
    x = data["x_val"][:8]
    np.testing.assert_allclose(
        reloaded.predict(x, verbose=0), model.predict(x, verbose=0),
        rtol=1e-6, atol=1e-7,
    )

    tfl_path = str(tmp_path / "m.tflite")
    n_bytes = export_tflite(model, tfl_path)
    assert n_bytes > 1000
    interp = tf.lite.Interpreter(model_path=tfl_path)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    interp.set_tensor(inp["index"], x[:1].astype(np.float32))
    interp.invoke()
    lite = interp.get_tensor(out["index"])
    np.testing.assert_allclose(
        lite, model.predict(x[:1], verbose=0), rtol=1e-4, atol=1e-5
    )
    tf.keras.backend.clear_session()


def test_int8_quantized_tflite(tmp_path, data):
    """Full-integer post-training quantization: the int8 flatbuffer must
    shrink well below the float one and keep top-1 agreement with the
    float model on held-out features."""
    template, genome = GENOMES[0]
    cfg = TrainConfig(epochs=3, batch_size=32, patience=3, num_classes=4,
                      compute_dtype="float32", template=template)
    params, state, _ = train_single(genome, data, cfg, seed=4)
    model = build_keras_model(genome, 4, data["x_val"].shape[1:3], template)
    transplant_weights(model, genome, params, state)

    fp = str(tmp_path / "m.tflite")
    q8 = str(tmp_path / "m_int8.tflite")
    n_fp = export_tflite(model, fp)
    n_q8 = export_tflite(model, q8, rep_data=data["x_train"][:64])
    assert n_q8 < 0.5 * n_fp

    interp = tf.lite.Interpreter(model_path=q8)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    scale, zero = inp["quantization"]
    x = data["x_val"][:16]
    preds = []
    for i in range(len(x)):
        xi = np.clip(np.round(x[i : i + 1] / scale + zero), -128, 127)
        interp.set_tensor(inp["index"], xi.astype(np.int8))
        interp.invoke()
        preds.append(int(interp.get_tensor(out["index"]).argmax()))
    float_preds = model.predict(x, verbose=0).argmax(-1)
    agreement = float(np.mean(np.asarray(preds) == float_preds))
    assert agreement >= 0.75, f"int8 top-1 agreement only {agreement}"
    tf.keras.backend.clear_session()
