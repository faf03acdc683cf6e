"""Golden-tensor parity: every routing-fabric module vs the torch reference.

The reference (at /root/reference) is instantiated with random weights,
those weights are copied into the flax modules (tests/parity/convert.py),
and outputs are compared on identical inputs. fp32, CPU both sides.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.parity import convert  # noqa: E402
from tests.parity.ref_loader import (  # noqa: E402
    import_reference,
    make_flax_config,
    make_ref_args,
    write_tiny_config_dirs,
)

ATOL = 2e-4  # softmax(100x) amplifies fp32 noise; see docs/PARITY.md

B, L, S, D = 4, 8, 5, 768  # batch, text len, image tokens, dim (768: the
# reference hardcodes nn.Linear(768,768) inside several cells)


@pytest.fixture(scope="module")
def ref(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cfgs"))
    bert_dir, clip_dir = write_tiny_config_dirs(root)
    mods = import_reference()
    args = make_ref_args(bert_dir, clip_dir)
    return mods, args


@pytest.fixture(scope="module")
def cfg():
    return make_flax_config()


@pytest.fixture()
def rnd():
    torch.manual_seed(7)
    return np.random.default_rng(7)


def _text_image(rnd):
    text = rnd.normal(size=(B, L, D)).astype(np.float32)
    image = rnd.normal(size=(B, S, D)).astype(np.float32)
    return text, image


def _cmp(ours, theirs, atol=ATOL, what=""):
    np.testing.assert_allclose(
        np.asarray(ours), t2n(theirs), atol=atol, err_msg=what)


def t2n(t):
    return t.detach().cpu().numpy()


class TestLeafModules:
    def test_router(self, ref, cfg, rnd):
        mods, args = ref
        rmod = mods["router"].Router(6, args.embed_size, args.hid_router).eval()
        x, _ = _text_image(rnd)
        expect = rmod(torch.tensor(x))

        from d2r_tpu.models.router import Router
        ours = Router(6, args.hid_router)
        vs = convert.as_variables(convert.router(rmod))
        got = ours.apply(vs, jnp.asarray(x))
        _cmp(got, expect, what="router")

    def test_cross_modal_alignment(self, ref, cfg, rnd):
        mods, args = ref
        from transformers import BertConfig
        rmod = mods["xm"].CrossModalAlignment(
            BertConfig.from_pretrained(args.bert_name), args).eval()
        text, image = _text_image(rnd)
        expect, _loss = rmod(torch.tensor(text), torch.tensor(image))

        from d2r_tpu.models.xmodules import CrossModalAlignment
        ours = CrossModalAlignment(D, alpha=0.0)
        vs = convert.as_variables(convert.cma(rmod))
        got, _ = ours.apply(vs, jnp.asarray(text), jnp.asarray(image))
        _cmp(got, expect, what="cma near-hard attention")

    def test_attention_filtration_eval_and_train(self, ref, cfg, rnd):
        mods, args = ref
        rmod = mods["xm"].AttentionFiltration(D)
        x = rnd.normal(size=(B, L + 1, D)).astype(np.float32)

        from d2r_tpu.models.xmodules import AttentionFiltration
        ours = AttentionFiltration(D)
        vs = convert.as_variables(convert.saf(rmod))

        # eval mode: running stats
        rmod.eval()
        _cmp(ours.apply(vs, jnp.asarray(x), use_running_average=True),
             rmod(torch.tensor(x)), what="saf eval")

        # train mode: batch stats + running-stat update
        rmod.train()
        expect = rmod(torch.tensor(x))
        got, mutated = ours.apply(vs, jnp.asarray(x), use_running_average=False,
                                  mutable=["batch_stats"])
        _cmp(got, expect, what="saf train")
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["bn"]["mean"]),
            t2n(rmod.bn.running_mean), atol=1e-5, err_msg="bn running mean")
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["bn"]["var"]),
            t2n(rmod.bn.running_var), atol=1e-5, err_msg="bn running var")

    def test_block_fusion(self, ref, cfg, rnd):
        mods, args = ref
        rmod = mods["xm"].Block([D, D], D).eval()
        a = rnd.normal(size=(B, D)).astype(np.float32)
        b = rnd.normal(size=(B, D)).astype(np.float32)
        expect = rmod([torch.tensor(a), torch.tensor(b)])

        from d2r_tpu.models.xmodules import BlockFusion
        ours = BlockFusion(D)
        vs = convert.as_variables(convert.block_fusion(rmod))
        got = ours.apply(vs, jnp.asarray(a), jnp.asarray(b))
        _cmp(got, expect, what="block fusion")

    def test_refinement(self, ref, cfg, rnd):
        mods, args = ref
        rmod = mods["refine"].Refinement(
            args, args.embed_size, args.raw_feature_norm_CMRC,
            args.lambda_softmax_CMRC).eval()
        text, image = _text_image(rnd)
        expect = rmod(torch.tensor(text), torch.tensor(image))

        from d2r_tpu.models.cells import Refinement
        ours = Refinement(make_flax_config())
        vs = convert.as_variables(convert.refinement(rmod))
        got = ours.apply(vs, jnp.asarray(text), jnp.asarray(image))
        _cmp(got, expect, what="refinement")


class TestCells:
    NUM_OUT = 6

    def _pair(self, got, expect, what):
        _cmp(got[0], expect[0], what=f"{what} emb")
        _cmp(got[1], expect[1], what=f"{what} path_prob")

    def test_ric(self, ref, cfg, rnd):
        mods, args = ref
        rmod = mods["cells"].RectifiedIdentityCell(args, self.NUM_OUT).eval()
        x, _ = _text_image(rnd)
        expect = rmod(torch.tensor(x))
        from d2r_tpu.models.cells import RectifiedIdentityCell
        ours = RectifiedIdentityCell(cfg, self.NUM_OUT)
        vs = convert.as_variables(convert.ric(rmod))
        self._pair(ours.apply(vs, jnp.asarray(x)), expect, "ric")

    def test_imrc(self, ref, cfg, rnd):
        mods, args = ref
        rmod = mods["cells"].IntraModelReasoningCell(args, self.NUM_OUT).eval()
        x, _ = _text_image(rnd)
        expect = rmod(torch.tensor(x))
        from d2r_tpu.models.cells import IntraModelReasoningCell
        ours = IntraModelReasoningCell(cfg, self.NUM_OUT)
        vs = convert.as_variables(convert.imrc(rmod))
        self._pair(ours.apply(vs, jnp.asarray(x)), expect, "imrc")

    def test_glac(self, ref, cfg, rnd):
        mods, args = ref
        rmod = mods["cells"].GlobalLocalAlignmentCell(args, self.NUM_OUT).eval()
        text, image = _text_image(rnd)
        expect = rmod(torch.tensor(text), torch.tensor(image))
        from d2r_tpu.models.cells import GlobalLocalAlignmentCell
        ours = GlobalLocalAlignmentCell(cfg, self.NUM_OUT)
        vs = convert.as_variables(convert.glac(rmod))
        got = ours.apply(vs, jnp.asarray(text), jnp.asarray(image),
                         use_running_average=True)
        self._pair(got, expect, "glac")

    def test_cmrc(self, ref, cfg, rnd):
        mods, args = ref
        rmod = mods["cells"].CrossModalRefinementCell(args, self.NUM_OUT).eval()
        text, image = _text_image(rnd)
        expect = rmod(torch.tensor(text), torch.tensor(image))
        from d2r_tpu.models.cells import CrossModalRefinementCell
        ours = CrossModalRefinementCell(cfg, self.NUM_OUT)
        vs = convert.as_variables(convert.cmrc(rmod))
        self._pair(ours.apply(vs, jnp.asarray(text), jnp.asarray(image)),
                   expect, "cmrc")

    def test_crcmc(self, ref, cfg, rnd):
        mods, args = ref
        rmod = mods["cells"].ContextRichCrossModalCell(args, self.NUM_OUT).eval()
        text, image = _text_image(rnd)
        expect = rmod(torch.tensor(text), torch.tensor(image))
        from d2r_tpu.models.cells import ContextRichCrossModalCell
        ours = ContextRichCrossModalCell(cfg, self.NUM_OUT)
        vs = convert.as_variables(convert.crcmc(rmod))
        self._pair(ours.apply(vs, jnp.asarray(text), jnp.asarray(image)),
                   expect, "crcmc")

    def test_gesc(self, ref, cfg, rnd):
        mods, args = ref
        rmod = mods["cells"].GlobalEnhancedSemanticCell(args, self.NUM_OUT).eval()
        text, image = _text_image(rnd)
        expect = rmod(torch.tensor(text), torch.tensor(image))
        from d2r_tpu.models.cells import GlobalEnhancedSemanticCell
        ours = GlobalEnhancedSemanticCell(cfg, self.NUM_OUT)
        vs = convert.as_variables(convert.gesc(rmod))
        self._pair(ours.apply(vs, jnp.asarray(text), jnp.asarray(image)),
                   expect, "gesc")


class TestRoutingLayers:
    def test_layer0_and_mid_and_final(self, ref, cfg, rnd):
        mods, args = ref
        text, image = _text_image(rnd)
        tt, ti = torch.tensor(text), torch.tensor(image)

        l0 = mods["di"].DynamicInteraction_Layer0(args, 6, 6).eval()
        mid = mods["di"].DynamicInteraction_Layer(args, 6, 6).eval()
        fin = mods["di"].DynamicInteraction_Layer(args, 6, 1).eval()

        ref_streams, ref_p0 = l0(tt, ti)
        ref_streams2, ref_p1 = mid(ref_streams, tt, ti)
        ref_out, ref_p2 = fin(ref_streams2, tt, ti)

        from d2r_tpu.models.interaction import DynamicRoutingLayer
        jt, ji = jnp.asarray(text), jnp.asarray(image)

        ours0 = DynamicRoutingLayer(cfg, 6)
        vs0 = convert.as_variables(convert.routing_layer(l0))
        streams, p0 = ours0.apply(vs0, None, jt, ji, True)
        _cmp(p0, ref_p0, what="layer0 paths")
        for j in range(6):
            _cmp(streams[j], ref_streams[j], what=f"layer0 stream {j}")

        oursm = DynamicRoutingLayer(cfg, 6)
        vsm = convert.as_variables(convert.routing_layer(mid))
        streams2, p1 = oursm.apply(vsm, streams, None, ji, True)
        _cmp(p1, ref_p1, what="mid paths")
        for j in range(6):
            _cmp(streams2[j], ref_streams2[j], what=f"mid stream {j}")

        oursf = DynamicRoutingLayer(cfg, 1)
        vsf = convert.as_variables(convert.routing_layer(fin))
        out, p2 = oursf.apply(vsf, streams2, None, ji, True)
        _cmp(p2, ref_p2, what="final paths")
        _cmp(out[0], ref_out[0], what="final stream")

    def test_interaction_module_both_directions(self, ref, cfg, rnd):
        mods, args = ref
        text, image = _text_image(rnd)
        tt, ti = torch.tensor(text), torch.tensor(image)

        rfwd = mods["im"].InteractionModule(args, num_layer_routing=args.DR_step,
                                            num_cells=6, path_hid=128).eval()
        rrev = mods["im"].Reversed_InteractionModule(
            args, num_layer_routing=args.DR_step, num_cells=6, path_hid=128).eval()
        ref_streams, ref_sim = rfwd(tt, ti)
        ref_rstreams, ref_rsim = rrev(tt, ti)

        from d2r_tpu.models.interaction import InteractionModule
        jt, ji = jnp.asarray(text), jnp.asarray(image)

        ours = InteractionModule(cfg, reversed_mode=False)
        vs = convert.as_variables(convert.interaction_module(rfwd))
        stream, sim = ours.apply(vs, jt, ji, True)
        _cmp(stream, ref_streams[0], what="itr stream")
        _cmp(sim, ref_sim, atol=5e-4, what="itr sim_paths")

        ours_r = InteractionModule(cfg, reversed_mode=True)
        vs_r = convert.as_variables(convert.interaction_module(rrev))
        rstream, rsim = ours_r.apply(vs_r, jt, ji, True)
        _cmp(rstream, ref_rstreams[0], what="rev itr stream")
        _cmp(rsim, ref_rsim, atol=5e-4, what="rev itr sim_paths")
