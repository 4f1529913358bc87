"""Training layer: fused train step semantics, loss descent on synthetic data,
checkpoint save/restore, early stopping, and data-parallel mesh training on
the 8-device CPU simulation mesh."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpumix.config import FrontendConfig, TrainConfig
from tpumix.models import MixingModelScalar1s
from tpumix.parallel.mesh import make_mesh
from tpumix.train.state import (
    adam_with_l2,
    create_train_state,
    make_eval_step,
    make_feature_train_step,
    make_train_step,
)
from tpumix.train.trainer import Trainer

SR = 8000
CHUNK = 6000  # 0.75 s -> 47 frames at hop 128
FRONTEND = FrontendConfig(n_fft=256, hop_length=128, sample_rate=SR)


class SynthChunks:
    """Tiny in-memory dataset: 4 stems with fixed true mix gains."""

    def __init__(self, n_items=16, seed=0):
        rng = np.random.default_rng(seed)
        t = np.arange(CHUNK) / SR
        self.items = []
        true_gains = np.array([0.9, 1.1, 0.8, 1.2], dtype=np.float32)
        for i in range(n_items):
            freqs = rng.uniform(50, 3000, size=4)
            stems = np.stack(
                [
                    (0.2 + 0.1 * rng.random())
                    * np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28))
                    for f in freqs
                ]
            ).astype(np.float32)
            stems += 0.01 * rng.standard_normal(stems.shape).astype(np.float32)
            mix = (true_gains[:, None] * stems).sum(axis=0)
            self.items.append((stems, mix.astype(np.float32)))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def batches(ds, bs=8):
    out = []
    for lo in range(0, len(ds), bs):
        items = [ds[i] for i in range(lo, min(lo + bs, len(ds)))]
        out.append(tuple(np.stack(p) for p in zip(*items)))
    return out


@pytest.fixture(scope="module")
def data():
    ds = SynthChunks(16)
    return batches(ds, bs=8)


@pytest.mark.heavy
class TestTrainStep:
    def test_loss_decreases(self, data):
        model = MixingModelScalar1s()
        tx = adam_with_l2(1e-3, 1e-5)
        state = create_train_state(model, jax.random.key(0), (1, 4, 129, 47), tx)
        step = jax.jit(make_train_step(model, FRONTEND, tx))
        rng = jax.random.key(1)
        losses = []
        for epoch in range(12):
            for stems, mix in data:
                state, m = step(state, jnp.asarray(stems), jnp.asarray(mix), rng)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.7, losses

    def test_eval_step_no_state_mutation(self, data):
        model = MixingModelScalar1s()
        tx = adam_with_l2(1e-3, 1e-5)
        state = create_train_state(model, jax.random.key(0), (1, 4, 129, 47), tx)
        ev = jax.jit(make_eval_step(model, FRONTEND))
        stems, mix = data[0]
        l1 = float(ev(state, jnp.asarray(stems), jnp.asarray(mix)))
        l2 = float(ev(state, jnp.asarray(stems), jnp.asarray(mix)))
        assert l1 == l2 and np.isfinite(l1)

    def test_feature_step(self, data):
        from tpumix.ops.stft import spectrogram_features

        model = MixingModelScalar1s()
        tx = adam_with_l2(1e-3, 1e-5)
        state = create_train_state(model, jax.random.key(0), (1, 4, 129, 47), tx)
        step = jax.jit(make_feature_train_step(model, tx))
        stems, mix = data[0]
        feats = spectrogram_features(jnp.asarray(stems), FRONTEND)
        gt = spectrogram_features(jnp.asarray(mix), FRONTEND)
        state2, m = step(state, feats, gt, jax.random.key(2))
        assert np.isfinite(float(m["loss"]))
        assert int(state2.step) == 1

    def test_adam_l2_matches_torch_semantics(self):
        # one step on a scalar param: grad' = grad + wd*param, then adam
        import optax

        tx = adam_with_l2(0.1, 0.5)
        params = {"w": jnp.asarray(2.0)}
        opt = tx.init(params)
        grads = {"w": jnp.asarray(1.0)}
        updates, _ = tx.update(grads, opt, params)
        # effective grad = 1 + 0.5*2 = 2; adam step ~ -lr * g/(sqrt(g^2)+eps) ~ -0.1
        assert abs(float(updates["w"]) + 0.1) < 1e-3


@pytest.mark.heavy
class TestMeshTraining:
    def test_dp_training_on_8_device_mesh(self, data, tmp_path):
        assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
        mesh = make_mesh((8,), ("dp",))
        model = MixingModelScalar1s()
        cfg = TrainConfig(batch_size=8, num_epochs=1, learning_rate=1e-3, seed=0,
                          checkpoint_dir=str(tmp_path))
        tr = Trainer(model, FRONTEND, cfg, (1, 4, 129, 47), mesh=mesh, run_name="mesh_test")

        class Loader:
            def __iter__(self):
                return iter(data)

            def __len__(self):
                return len(data)

        res = tr.fit(Loader(), Loader(), 0, 1)
        assert len(res.train_loss) == 1 and np.isfinite(res.train_loss[0])

    def test_val_epoch_sharded_matches_unsharded(self, data, tmp_path):
        """The mesh trainer's val pass (dp-sharded batches, annotated eval
        step) computes the same loss as the single-device val pass."""
        model = MixingModelScalar1s()
        cfg = TrainConfig(batch_size=8, num_epochs=1, learning_rate=1e-3, seed=0,
                          checkpoint_dir=str(tmp_path))
        mesh = make_mesh((8,), ("dp",))
        tr_mesh = Trainer(model, FRONTEND, cfg, (1, 4, 129, 47), mesh=mesh,
                          run_name="val_mesh")
        tr_solo = Trainer(model, FRONTEND, cfg, (1, 4, 129, 47), run_name="val_solo")
        v_mesh = tr_mesh._run_val_epoch(list(data))
        v_solo = tr_solo._run_val_epoch(list(data))
        assert np.isfinite(v_mesh)
        np.testing.assert_allclose(v_mesh, v_solo, rtol=1e-5)

    def test_dp_matches_single_device(self, data):
        """One DP step on the mesh == one step on a single device."""
        model = MixingModelScalar1s()
        tx = adam_with_l2(1e-3, 1e-5)
        state = create_train_state(model, jax.random.key(0), (1, 4, 129, 47), tx)
        raw_step = make_train_step(model, FRONTEND, tx)
        stems, mix = data[0]
        rng = jax.random.key(3)

        s_single, m_single = jax.jit(raw_step)(
            state, jnp.asarray(stems), jnp.asarray(mix), rng
        )

        from tpumix.parallel.mesh import data_parallel_jit, shard_batch

        mesh = make_mesh((8,), ("dp",))
        state2 = create_train_state(model, jax.random.key(0), (1, 4, 129, 47), tx)
        sh_stems, sh_mix = shard_batch((stems, mix), mesh)
        s_mesh, m_mesh = data_parallel_jit(raw_step, mesh, donate_state=False)(
            state2, sh_stems, sh_mix, rng
        )
        # f32 reduction order differs between the sharded and single-device
        # programs; agreement to ~1e-4 relative confirms the gradient psum
        np.testing.assert_allclose(
            float(m_single["loss"]), float(m_mesh["loss"]), rtol=1e-4
        )
        # compare eval-mode gradients: train-mode grads at init are
        # discretely ill-conditioned (BatchNorm centres activations exactly
        # on the ReLU kink, so 1e-7 reduction-order noise flips activation
        # patterns), while eval-mode grads are smooth and must match to
        # reduction-order noise — this is the real psum-correctness check
        from tpumix.ops.stft import spectrogram_features
        from tpumix.parallel.mesh import batch_sharding, replicated

        def grads_fn(state_, stems_, mix_):
            feats = spectrogram_features(stems_, FRONTEND)
            gt = spectrogram_features(mix_, FRONTEND)

            def loss_fn(p):
                masked, _ = model.apply(
                    {"params": p, "batch_stats": state_.batch_stats},
                    feats, train=False,
                )
                return jnp.mean(jnp.square(masked - gt))

            return jax.grad(loss_fn)(state_.params)

        g_single = jax.jit(grads_fn)(state, jnp.asarray(stems), jnp.asarray(mix))

        def sharded_grads(state_, stems_, mix_):
            stems_ = jax.lax.with_sharding_constraint(stems_, batch_sharding(mesh, stems_.ndim))
            mix_ = jax.lax.with_sharding_constraint(mix_, batch_sharding(mesh, mix_.ndim))
            return jax.lax.with_sharding_constraint(
                grads_fn(state_, stems_, mix_), replicated(mesh)
            )

        g_mesh = jax.jit(sharded_grads)(state2, sh_stems, sh_mix)
        for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_mesh)):
            scale = max(1e-3, float(np.max(np.abs(np.asarray(a)))))
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-4
            )


class TestTrainerLoop:
    def test_fit_checkpoints_and_early_stop(self, data, tmp_path):
        model = MixingModelScalar1s()
        cfg = TrainConfig(
            batch_size=8,
            num_epochs=3,
            learning_rate=1e-3,
            checkpoint_dir=str(tmp_path),
            early_stopping_patience=10,
            seed=0,
        )
        tr = Trainer(model, FRONTEND, cfg, (1, 4, 129, 47), run_name="loop_test")

        class Loader:
            def __iter__(self):
                return iter(data)

            def __len__(self):
                return len(data)

        res = tr.fit(Loader(), Loader(), 0, 3)
        assert len(res.train_loss) == 3
        assert res.train_loss[-1] < res.train_loss[0]

        # restore epoch 0 and confirm state round-trips
        params_before = jax.tree.leaves(tr.state.params)[0].copy()
        tr.restore_checkpoint(0)
        params_after = jax.tree.leaves(tr.state.params)[0]
        assert not np.allclose(np.asarray(params_before), np.asarray(params_after))

    def test_keep_best_k(self, data, tmp_path):
        import os

        model = MixingModelScalar1s()
        cfg = TrainConfig(
            batch_size=8, num_epochs=3, checkpoint_dir=str(tmp_path),
            keep_checkpoints=1, seed=0,
        )
        tr = Trainer(model, FRONTEND, cfg, (1, 4, 129, 47), run_name="keep1")

        class Loader:
            def __iter__(self):
                return iter(data)

            def __len__(self):
                return len(data)

        tr.fit(Loader(), Loader(), 0, 3)
        kept = [d for d in os.listdir(tr.ckpt_dir) if d.startswith("epoch_")]
        assert len(kept) == 1


@pytest.mark.heavy
class TestPallasFrontendTraining:
    def test_train_step_with_pallas_frontend(self, data):
        """Pallas-forward/XLA-backward frontend trains (interpret mode on CPU)."""
        import dataclasses

        fe = dataclasses.replace(FRONTEND, implementation="pallas")
        model = MixingModelScalar1s()
        tx = adam_with_l2(1e-3, 1e-5)
        state = create_train_state(model, jax.random.key(0), (1, 4, 129, 47), tx)
        step = jax.jit(make_train_step(model, fe, tx))
        stems, mix = data[0]
        s2, m = step(state, jnp.asarray(stems), jnp.asarray(mix), jax.random.key(1))
        assert np.isfinite(float(m["loss"]))

        # loss matches the fft-frontend step to frontend-conformance noise
        step_fft = jax.jit(make_train_step(model, FRONTEND, tx))
        _, m_fft = step_fft(state, jnp.asarray(stems), jnp.asarray(mix), jax.random.key(1))
        assert abs(float(m["loss"]) - float(m_fft["loss"])) / float(m_fft["loss"]) < 1e-3


@pytest.mark.heavy
class TestInt16Training:
    def test_int16_batches_match_f32(self, data):
        """int16 waveform batches (on-device dequant) produce the same loss
        as f32 when samples are on the PCM16 grid."""
        model = MixingModelScalar1s()
        tx = adam_with_l2(1e-3, 1e-5)
        state = create_train_state(model, jax.random.key(0), (1, 4, 129, 47), tx)
        step = jax.jit(make_train_step(model, FRONTEND, tx))
        stems, mix = data[0]
        q = lambda a: np.clip(np.rint(a * 32768.0), -32768, 32767)  # noqa: E731
        stems_g = (q(stems) / 32768.0).astype(np.float32)
        mix_g = (q(mix) / 32768.0).astype(np.float32)
        _, m_f32 = step(state, jnp.asarray(stems_g), jnp.asarray(mix_g), jax.random.key(1))
        _, m_i16 = step(
            state,
            jnp.asarray(q(stems).astype(np.int16)),
            jnp.asarray(q(mix).astype(np.int16)),
            jax.random.key(1),
        )
        np.testing.assert_allclose(float(m_f32["loss"]), float(m_i16["loss"]), rtol=1e-6)

    def test_trainer_int16_mode(self, data, tmp_path):
        model = MixingModelScalar1s()
        cfg = TrainConfig(batch_size=8, num_epochs=1, checkpoint_dir=str(tmp_path),
                          seed=0, transfer_dtype="int16")
        tr = Trainer(model, FRONTEND, cfg, (1, 4, 129, 47), run_name="i16")

        class Loader:
            def __iter__(self):
                return iter(data)

            def __len__(self):
                return len(data)

        res = tr.fit(Loader(), Loader(), 0, 1)
        assert np.isfinite(res.train_loss[0])


@pytest.mark.heavy
class TestResume:
    def test_resume_restores_latest(self, data, tmp_path):
        model = MixingModelScalar1s()
        cfg = TrainConfig(batch_size=8, num_epochs=2, checkpoint_dir=str(tmp_path), seed=0)
        tr = Trainer(model, FRONTEND, cfg, (1, 4, 129, 47), run_name="resume_t")

        class Loader:
            def __iter__(self):
                return iter(data)

            def __len__(self):
                return len(data)

        tr.fit(Loader(), Loader(), 0, 2)
        # a fresh trainer instance over the same run dir resumes at epoch 2
        tr2 = Trainer(model, FRONTEND, cfg, (1, 4, 129, 47), run_name="resume_t")
        start = tr2.resume()
        assert start == 2
        # the restored params match the epoch-1 checkpoint
        import jax as _jax

        tr.restore_checkpoint(1)
        for a, b in zip(_jax.tree.leaves(tr.state.params), _jax.tree.leaves(tr2.state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_resume_fresh_run(self, tmp_path):
        model = MixingModelScalar1s()
        cfg = TrainConfig(batch_size=8, num_epochs=1, checkpoint_dir=str(tmp_path), seed=0)
        tr = Trainer(model, FRONTEND, cfg, (1, 4, 129, 47), run_name="fresh")
        assert tr.resume() == 0


class TestResumeHalfWrittenCheckpoint:
    """A kill mid-save (attempt timeout, preemption) leaves an Orbax
    ``epoch_<N>.orbax-checkpoint-tmp`` staging dir; the resume scan must
    neither crash on it nor treat it as restorable (crash-looped every
    resume retry when it parsed ``int(d.split('_')[1])`` — round 5)."""

    def _trainer(self, tmp_path):
        model = MixingModelScalar1s()
        cfg = TrainConfig(batch_size=8, num_epochs=1, checkpoint_dir=str(tmp_path), seed=0)
        return Trainer(model, FRONTEND, cfg, (1, 4, 129, 47), run_name="sweep_t")

    def test_latest_epoch_ignores_staging_dirs(self, tmp_path):
        tr = self._trainer(tmp_path)
        os.makedirs(os.path.join(tr.ckpt_dir, "epoch_0003"))
        os.makedirs(os.path.join(tr.ckpt_dir, "epoch_0005.orbax-checkpoint-tmp"))
        assert tr.latest_epoch() == 3

    def test_resume_sweeps_staging_dir_and_starts_fresh(self, tmp_path):
        tr = self._trainer(tmp_path)
        stale = os.path.join(tr.ckpt_dir, "epoch_0002.orbax-checkpoint-tmp")
        os.makedirs(stale)
        assert tr.resume() == 0  # nothing restorable -> fresh start, no crash
        assert not os.path.exists(stale)  # staging dir swept


class TestAugmentMixPlumbing:
    """TrainConfig.augment_mix (CLI --augment-stems-only) must reach
    make_train_step: the reference's all-five-tracks augmentation re-gains
    the mix independently of the stems, which turns lstsq-family targets
    into irreducible common-mode noise (measured round 5, docs/TUTORIAL.md)
    — stem-only augmentation is the documented deviation for that family."""

    def test_config_flag_reaches_train_step(self, monkeypatch, tmp_path):
        import tpumix.train.trainer as tr_mod

        captured = {}
        real = tr_mod.make_train_step

        def spy(*a, **kw):
            captured.update(kw)
            return real(*a, **kw)

        monkeypatch.setattr(tr_mod, "make_train_step", spy)
        cfg = TrainConfig(batch_size=8, num_epochs=1, checkpoint_dir=str(tmp_path),
                          seed=0, augment=True, augment_mix=False)
        Trainer(MixingModelScalar1s(), FRONTEND, cfg, (1, 4, 129, 47), run_name="am")
        assert captured["augment_mix"] is False
        assert captured["augment"] is True


class TestFitEndEpochSemantics:
    """fit's 4th argument is the run's TOTAL length (exclusive end epoch),
    not a per-call increment — a stall-segmented --resume run must stop at
    --epochs instead of re-adding the full count every retry (caught live
    round 5: a 100-epoch run kept training past 100 at floor cosine LR)."""

    def test_start_at_end_trains_nothing(self, tmp_path):
        model = MixingModelScalar1s()
        cfg = TrainConfig(batch_size=8, num_epochs=100, checkpoint_dir=str(tmp_path), seed=0)
        tr = Trainer(model, FRONTEND, cfg, (1, 4, 129, 47), run_name="done_t")

        class ExplodingLoader:
            def __iter__(self):
                raise AssertionError("a completed run must not train more epochs")

            def __len__(self):
                return 1

        res = tr.fit(ExplodingLoader(), ExplodingLoader(), 100, 100)
        assert res.train_loss == [] and res.best_epoch == -1


@pytest.mark.heavy
class TestGainSupervised:
    """Label-supervised objective for generators that know the true gains
    (tpumix.train.state.make_gain_train_step + SyntheticTrainer loss='gain')."""

    def test_synth_labels_reconstruct_mix(self):
        from tpumix.data.synthetic import synth_chunk_batch

        stems, mix, g = synth_chunk_batch(jax.random.key(3), 4, 4096, sr=SR,
                                          return_gains=True)
        # the labels are exact: sum_i 10**(0.5 g_i) * stem_i == mix
        amp = 10.0 ** (0.5 * np.asarray(g))
        recon = np.einsum("bsn,bs->bn", np.asarray(stems), amp)
        np.testing.assert_allclose(recon, np.asarray(mix), rtol=1e-4, atol=1e-5)

    def test_gain_step_descends_to_labels(self):
        from tpumix.train.state import make_gain_eval_step, make_gain_train_step

        model = MixingModelScalar1s()
        tx = adam_with_l2(1e-3, 1e-5)
        state = create_train_state(model, jax.random.key(0), (1, 4, 129, 47), tx)
        step = jax.jit(make_gain_train_step(model, FRONTEND, tx, mesh=None, dp_axis=None))
        evl = jax.jit(make_gain_eval_step(model, FRONTEND))

        rng = np.random.default_rng(0)
        stems = rng.uniform(-0.3, 0.3, size=(8, 4, CHUNK)).astype(np.float32)
        g_true = rng.uniform(-0.4, 0.4, size=(8, 4)).astype(np.float32)
        first = None
        for i in range(12):
            state, metrics = step(state, jnp.asarray(stems), jnp.asarray(g_true),
                                  jax.random.key(i))
            if first is None:
                first = float(metrics["loss"])
            assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["loss"]) < first
        # metric plumbing: gain_rmse_db == 10 * sqrt(mse)
        np.testing.assert_allclose(
            float(metrics["gain_rmse_db"]), 10.0 * np.sqrt(float(metrics["loss"])),
            rtol=1e-5,
        )
        assert np.isfinite(float(evl(state, jnp.asarray(stems), jnp.asarray(g_true))))

    def test_synthetic_trainer_gain_loss(self, tmp_path):
        from tpumix.train.trainer import SyntheticTrainer

        model = MixingModelScalar1s()
        cfg = TrainConfig(batch_size=4, num_epochs=1, checkpoint_dir=str(tmp_path),
                          seed=0, loss="gain")
        tr = SyntheticTrainer(model, FRONTEND, cfg, (1, 4, 129, 47),
                              chunk_samples=CHUNK, sr=SR, run_name="gain_t",
                              val_batches=1)
        res = tr.fit(2, jax.random.key(1), 0, 1)
        assert np.isfinite(res.train_loss[0]) and np.isfinite(res.val_loss[0])

    def test_synthetic_trainer_gain_loss_dp_mesh(self, tmp_path):
        from tpumix.parallel.mesh import make_mesh
        from tpumix.train.trainer import SyntheticTrainer

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device simulation mesh")
        mesh = make_mesh((8,), ("dp",))
        model = MixingModelScalar1s()
        cfg = TrainConfig(batch_size=8, num_epochs=1, checkpoint_dir=str(tmp_path),
                          seed=0, loss="gain")
        tr = SyntheticTrainer(model, FRONTEND, cfg, (1, 4, 129, 47),
                              chunk_samples=CHUNK, sr=SR, mesh=mesh,
                              run_name="gain_dp", val_batches=1)
        res = tr.fit(2, jax.random.key(1), 0, 1)
        assert np.isfinite(res.train_loss[0]) and np.isfinite(res.val_loss[0])

    def test_context_windows_keep_exact_labels(self):
        from tpumix.data.synthetic import synth_chunk_batch

        stems, mix, g = synth_chunk_batch(jax.random.key(5), 4, 2048, sr=SR,
                                          return_gains=True, context_mult=4)
        assert stems.shape == (4, 4, 2048) and mix.shape == (4, 2048)
        # the engineer gain is context-global, so the window mix is still the
        # exact gain-weighted window stem sum
        amp = 10.0 ** (0.5 * np.asarray(g))
        recon = np.einsum("bsn,bs->bn", np.asarray(stems), amp)
        np.testing.assert_allclose(recon, np.asarray(mix), rtol=1e-4, atol=1e-5)
        # window RMS fluctuates around the context level (distribution match):
        # not every window sits exactly at its drawn RMS the way K=1 does
        rms_db = 20 * np.log10(np.sqrt((np.asarray(stems) ** 2).mean(-1)))
        assert np.std(rms_db) > 0.05

    def test_level_shift_compensated_labels(self):
        from tpumix.data.synthetic import synth_chunk_batch

        key = jax.random.key(9)
        s0, m0, g0 = synth_chunk_batch(key, 4, 2048, sr=SR, return_gains=True,
                                       context_mult=2)
        s1, m1, g1 = synth_chunk_batch(key, 4, 2048, sr=SR, return_gains=True,
                                       context_mult=2, level_shift_db=(-12.0, -12.0))
        # same key => same underlying song; a -12 dB shared shift scales the
        # observed stems by 10^(-12/20), the labels compensate by +12 dB
        # (= +1.2 in the model-scalar domain), and the engineer mix — defined
        # by the absolute targets — is unchanged
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0) + 1.2, rtol=1e-5)
        c = 10.0 ** (-12.0 / 20.0)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s0) * c, rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), rtol=1e-4, atol=1e-7)
        # reconstruction stays exact under shift
        amp = 10.0 ** (0.5 * np.asarray(g1))
        recon = np.einsum("bsn,bs->bn", np.asarray(s1), amp)
        np.testing.assert_allclose(recon, np.asarray(m1), rtol=1e-4, atol=1e-5)


@pytest.mark.heavy
class TestResumeScores:
    def test_keep_k_quota_spans_resume(self, data, tmp_path):
        """resume() must reload scores.json so keep_checkpoints prunes
        pre-resume epochs too (round-2 review finding)."""
        model = MixingModelScalar1s()
        cfg = TrainConfig(batch_size=8, num_epochs=2, checkpoint_dir=str(tmp_path),
                          seed=0, keep_checkpoints=2)
        tr = Trainer(model, FRONTEND, cfg, (1, 4, 129, 47), run_name="rk")

        class Loader:
            def __iter__(self):
                return iter(data)

            def __len__(self):
                return len(data)

        tr.fit(Loader(), Loader(), 0, 2)
        tr2 = Trainer(model, FRONTEND, cfg, (1, 4, 129, 47), run_name="rk")
        start = tr2.resume()
        assert start == 2
        assert len(tr2._scores) == 2  # ledger reloaded
        tr2.fit(Loader(), Loader(), start, 4)  # continue to a 4-epoch total
        kept = sorted(d for d in (tmp_path / "rk").iterdir()
                      if d.name.startswith("epoch_"))
        assert len(kept) == 2  # quota enforced across the resume boundary


class TestMulawTraining:
    def test_mulaw8_batches_train(self, data, tmp_path):
        """transfer_dtype='mulaw8' ships int8 mu-law batches with on-device
        decode — previously accepted by the CLI and silently ignored."""
        model = MixingModelScalar1s()
        cfg = TrainConfig(batch_size=8, num_epochs=1, checkpoint_dir=str(tmp_path),
                          seed=0, transfer_dtype="mulaw8")
        tr = Trainer(model, FRONTEND, cfg, (1, 4, 129, 47), run_name="mulaw_t")

        class Loader:
            def __iter__(self):
                return iter(data)

            def __len__(self):
                return len(data)

        res = tr.fit(Loader(), Loader(), 0, 1)
        assert np.isfinite(res.train_loss[0])

    def test_unknown_transfer_dtype_rejected(self, data, tmp_path):
        model = MixingModelScalar1s()
        cfg = TrainConfig(batch_size=8, num_epochs=1, checkpoint_dir=str(tmp_path),
                          seed=0, transfer_dtype="int4")
        tr = Trainer(model, FRONTEND, cfg, (1, 4, 129, 47), run_name="bad_t")

        class Loader:
            def __iter__(self):
                return iter(data)

            def __len__(self):
                return len(data)

        with pytest.raises(ValueError, match="transfer_dtype"):
            tr.fit(Loader(), Loader(), 0, 1)


class TestLossValidation:
    def test_gain_loss_rejected_outside_synthetic_trainer(self):
        """Library API parity with the CLI guard: loss='gain' needs generator
        labels only SyntheticTrainer supplies — make_train_step must raise
        rather than silently training the 'reference' objective."""
        model = MixingModelScalar1s()
        tx = adam_with_l2(1e-3, 1e-5)
        with pytest.raises(ValueError, match="gain"):
            make_train_step(model, FRONTEND, tx, loss="gain")
        with pytest.raises(ValueError, match="loss"):
            make_eval_step(model, FRONTEND, loss="nonsense")


class TestEvalUsesTrainingFrontend:
    def test_eval_step_matches_train_features_pallas(self, data):
        """make_eval_step must judge the SAME features training saw: with
        implementation='pallas' the eval loss equals a hand-built eval pass
        over make_frontend_fn features exactly (not just to fft-vs-pallas
        conformance noise)."""
        import dataclasses

        from tpumix.train.state import make_frontend_fn

        fe = dataclasses.replace(FRONTEND, implementation="pallas")
        model = MixingModelScalar1s()
        tx = adam_with_l2(1e-3, 1e-5)
        state = create_train_state(model, jax.random.key(0), (1, 4, 129, 47), tx)
        stems, mix = data[0]

        loss = float(jax.jit(make_eval_step(model, fe))(
            state, jnp.asarray(stems), jnp.asarray(mix)))

        _features = make_frontend_fn(fe)

        def manual(state, stems, mix):
            feats = _features(stems)
            gt = _features(mix)
            masked, _ = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                feats, train=False)
            return jnp.mean(jnp.square(masked - gt))

        expected = float(jax.jit(manual)(state, jnp.asarray(stems), jnp.asarray(mix)))
        assert loss == pytest.approx(expected, rel=1e-6, abs=0.0)


@pytest.mark.slow
class TestProductionShapeMesh:
    def test_dp_sp_training_step_at_production_shape(self):
        """ONE dp x sp-sharded train step at the REAL Scalar2s contract
        (2048-point STFT -> 1025 bins x 173 frames, the dilated block-1 and
        the 9x9 conv's sp-axis halo at the true frame extent).  GSPMD is
        largely shape-agnostic, but padding/halo surprises live exactly at
        the shapes never run (round-2 judge finding)."""
        from tpumix.models import MixingModelScalar2s
        from tpumix.train.state import make_train_step

        frontend = FrontendConfig(n_fft=2048, hop_length=512, sample_rate=44100)
        chunk = 88200  # 2 s -> 173 frames
        mesh = make_mesh((4, 2), ("dp", "sp"))
        model = MixingModelScalar2s()
        tx = adam_with_l2(1e-3, 1e-5)
        state = create_train_state(model, jax.random.key(0), (1, 4, 1025, 173), tx)

        from tpumix.parallel.mesh import replicated, shard_batch

        state = jax.device_put(state, replicated(mesh))
        step = make_train_step(
            model, frontend, tx, augment=True, mesh=mesh, dp_axis="dp", sp_axis="sp"
        )
        rep = replicated(mesh)

        def wrapped(state_, stems_, mix_, rng_):
            state_ = jax.lax.with_sharding_constraint(state_, rep)
            return jax.lax.with_sharding_constraint(
                step(state_, stems_, mix_, rng_), rep
            )

        rng = np.random.default_rng(0)
        stems = np.asarray(rng.standard_normal((8, 4, chunk)) * 0.1, np.float32)
        mix = stems.sum(axis=1)
        sh_stems, sh_mix = shard_batch((stems, mix), mesh)
        new_state, metrics = jax.jit(wrapped)(state, sh_stems, sh_mix, jax.random.key(1))
        jax.block_until_ready(new_state)
        assert np.isfinite(float(metrics["loss"]))
        # params actually moved and stayed replicated
        delta = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, new_state.params
        )
        assert max(jax.tree.leaves(delta)) > 0

    def test_chunk_sharded_scalar2s_segment_matches_unsharded(self):
        """Chunk-axis-sharded SongMixer at the Scalar2s production shape
        (2 s chunks, 173 frames) equals the unsharded path."""
        from tpumix.config import ModelConfig
        from tpumix.infer.mixer import SongMixer, STEMS
        from tpumix.models import MixingModelScalar2s
        from tpumix.parallel.mesh import make_mesh as mk

        model = MixingModelScalar2s()
        variables = model.init(
            jax.random.key(0), np.zeros((1, 4, 1025, 173), np.float32), train=False
        )
        cfg = ModelConfig(name="scalar2s", chunk_length_s=2.0, hop_length=512)
        rng = np.random.default_rng(3)
        stems = (0.2 * rng.standard_normal((4, 44100 * 20))).astype(np.float32)
        plain = SongMixer(model, variables, cfg).song_gains(stems)
        mesh = mk((8,), ("sp",))
        sharded = SongMixer(model, variables, cfg, mesh=mesh, chunk_axis="sp").song_gains(stems)
        np.testing.assert_allclose(plain, sharded, atol=1e-4)


class TestSelfSupervisedObjectiveBias:
    def test_incoherent_sum_biases_optimum_below_true_gains(self):
        """Pin the measured bias of the self-supervised objectives on the
        synthetic family (train/state.py's 'several dB' claim): magnitude
        spectrograms of overlapping stems add incoherently, so |X_mix| <
        sum_s g_s |X_s| and the roundtrip loss is minimised by gains BELOW
        the generator's true gains.  The test scans a shared offset delta on
        the true gains and asserts the optimum sits 1-8 dB low."""
        from tpumix.data.synthetic import synth_chunk_batch
        from tpumix.ops.stft import spectrogram_features
        from tpumix.train.state import _roundtrip_masked_db

        fe = FrontendConfig()  # production frontend: 2048/512... (hop below)
        import dataclasses

        fe = dataclasses.replace(fe, hop_length=512)
        stems, mix, g_true = synth_chunk_batch(
            jax.random.key(0), 8, 44100, 44100, return_gains=True
        )
        feats = spectrogram_features(stems, fe)
        gt = spectrogram_features(mix, fe)

        def loss(delta):
            gains = g_true + delta  # model-scalar domain: 1 unit = 10 dB
            masked = _roundtrip_masked_db(feats, gains, fe.amin)
            return float(jnp.mean(jnp.square(masked - gt)))

        deltas = np.linspace(-1.0, 0.3, 27)  # -10 dB .. +3 dB
        losses = [loss(float(d)) for d in deltas]
        best_db = 10.0 * deltas[int(np.argmin(losses))]
        assert -8.0 <= best_db <= -1.0, f"optimum offset {best_db:.2f} dB"
        # and the true gains are measurably NOT the optimum
        assert loss(0.0) > min(losses) * 1.02


@pytest.mark.heavy
class TestCoherentLoss:
    def test_coherent_optimum_is_true_gains(self):
        """Waveform-domain self-supervision is identifiable: on exact
        gain-weighted synthetic sums the loss at the true gains is (near)
        zero and any shared offset strictly increases it — the property the
        magnitude objectives lack (TestSelfSupervisedObjectiveBias)."""
        from tpumix.data.synthetic import synth_chunk_batch

        stems, mix, g_true = synth_chunk_batch(
            jax.random.key(1), 4, 12000, 44100, return_gains=True
        )

        def loss(delta):
            amp = 10.0 ** (0.5 * (g_true + delta))
            mix_pred = jnp.einsum("bst,bs->bt", stems, amp)
            return float(jnp.mean(jnp.square(mix_pred - mix)) / jnp.mean(jnp.square(mix)))

        at_true = loss(0.0)
        assert at_true < 1e-6
        for d in (-0.3, -0.1, 0.1, 0.3):
            assert loss(d) > at_true + 1e-3

    def test_coherent_step_descends(self, data):
        model = MixingModelScalar1s()
        tx = adam_with_l2(1e-3, 1e-5)
        state = create_train_state(model, jax.random.key(0), (1, 4, 129, 47), tx)
        step = jax.jit(make_train_step(model, FRONTEND, tx, loss="coherent"))
        ev = jax.jit(make_eval_step(model, FRONTEND, loss="coherent"))
        stems, mix = data[0]
        l0 = float(ev(state, jnp.asarray(stems), jnp.asarray(mix)))
        for i in range(20):
            state, m = step(state, jnp.asarray(stems), jnp.asarray(mix), jax.random.key(2))
        l1 = float(ev(state, jnp.asarray(stems), jnp.asarray(mix)))
        assert np.isfinite(l1) and l1 < l0


@pytest.mark.heavy
class TestLstsqLoss:
    def test_targets_recover_true_gains_on_exact_sums(self):
        """On exact gain-weighted synthetic sums the closed-form projection
        IS the generator's gains (to f32 solve noise)."""
        from tpumix.data.synthetic import synth_chunk_batch
        from tpumix.train.state import _lstsq_gain_targets

        stems, mix, g_true = synth_chunk_batch(
            jax.random.key(5), 6, 12000, 44100, return_gains=True,
            context_mult=4, level_shift_db=(-14.0, 2.0),
        )
        g_star = _lstsq_gain_targets(stems, mix)
        np.testing.assert_allclose(np.asarray(g_star), np.asarray(g_true),
                                   rtol=1e-3, atol=1e-3)

    def test_targets_on_inexact_mix_are_best_explanation(self):
        """When the mix is NOT an exact weighted sum (real-corpus case), the
        projection still minimises the residual: perturbing any target gain
        increases the reconstruction error."""
        from tpumix.train.state import _lstsq_gain_targets

        rng = np.random.default_rng(0)
        stems = jnp.asarray(rng.standard_normal((2, 4, 4000)), jnp.float32) * 0.2
        true_amp = jnp.asarray(rng.uniform(0.5, 2.0, (2, 4)), jnp.float32)
        mix = jnp.einsum("bst,bs->bt", stems, true_amp)
        mix = mix + 0.05 * jnp.asarray(rng.standard_normal(mix.shape), jnp.float32)
        g_star = _lstsq_gain_targets(stems, mix)
        amp_star = 10.0 ** (0.5 * g_star)

        def resid(amp):
            return float(jnp.mean(jnp.square(jnp.einsum("bst,bs->bt", stems, amp) - mix)))

        base = resid(amp_star)
        for s in range(4):
            for d in (-0.05, 0.05):
                pert = amp_star.at[:, s].add(d)
                assert resid(pert) > base

    def test_targets_finite_for_silent_stems(self):
        """An all-silent batch item (song intro/outro window on a real
        corpus) must NOT poison the targets with NaN: gram == 0 makes the
        relative Tikhonov jitter vanish, so the absolute floor + finite
        guard must carry it to the quiet-floor gain instead (round-3
        review finding)."""
        from tpumix.train.state import _lstsq_gain_targets

        rng = np.random.default_rng(7)
        stems = jnp.asarray(rng.standard_normal((3, 4, 2000)), jnp.float32) * 0.2
        mix = jnp.sum(stems, axis=1)
        stems = stems.at[1].set(0.0)  # one silent item mid-batch
        mix = mix.at[1].set(0.0)
        g_star = np.asarray(_lstsq_gain_targets(stems, mix))
        assert np.all(np.isfinite(g_star))
        # the silent item clamps to the quiet floor: 2*log10(1e-3) = -6
        np.testing.assert_allclose(g_star[1], -6.0, atol=1e-5)
        # neighbours are unaffected
        exact = np.asarray(_lstsq_gain_targets(stems[::2], mix[::2]))
        np.testing.assert_allclose(g_star[::2], exact, rtol=1e-5, atol=1e-5)

    def test_lstsq_step_descends(self, data):
        model = MixingModelScalar1s()
        tx = adam_with_l2(1e-3, 1e-5)
        state = create_train_state(model, jax.random.key(0), (1, 4, 129, 47), tx)
        step = jax.jit(make_train_step(model, FRONTEND, tx, loss="lstsq"))
        ev = jax.jit(make_eval_step(model, FRONTEND, loss="lstsq"))
        stems, mix = data[0]
        l0 = float(ev(state, jnp.asarray(stems), jnp.asarray(mix)))
        for _ in range(25):
            state, m = step(state, jnp.asarray(stems), jnp.asarray(mix), jax.random.key(2))
        l1 = float(ev(state, jnp.asarray(stems), jnp.asarray(mix)))
        assert np.isfinite(l1) and l1 < l0 * 0.8
