"""Interactive demo — role of /root/reference/app.py (the HF-Spaces Gradio
UI over AdaFaceWrapper). Uses gradio when installed; otherwise falls back to
a simple REPL over the same AdaFacePipeline."""

from __future__ import annotations

import argparse

import jax

from adaprompt_tpu.cli import common
from adaprompt_tpu.cli.txt2img import load_subj_basis


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    common.add_model_args(p)
    p.add_argument("--adaface_ckpt", type=str, default=None)
    p.add_argument("--subject_string", type=str, default="z")
    p.add_argument("--num_steps", type=int, default=50)
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--outdir", type=str, default="outputs/demo")
    p.add_argument("--warmup", action="store_true", default=True,
                   help="AOT-compile the serving signatures before the UI "
                        "comes up (AdaFacePipeline.warmup); with the "
                        "persistent compile cache this replays from disk")
    p.add_argument("--no_warmup", dest="warmup", action="store_false")
    return p.parse_args(argv)


def build_pipeline(args):
    pipe = common.load_pipeline(args)
    sbg_params, scfg = load_subj_basis(args, pipe)
    from adaprompt_tpu.adaface.wrapper import AdaFacePipeline
    from adaprompt_tpu.eval.face_eval import FaceSimilarityEvaluator
    from adaprompt_tpu.models import arcface
    face_embedder = FaceSimilarityEvaluator(arcface.init_params(jax.random.PRNGKey(2)))
    return AdaFacePipeline(pipe, sbg_params, scfg, pipe.params.text,
                           pipe.text_cfg, face_embedder=face_embedder,
                           subject_string=args.subject_string,
                           num_inference_steps=args.num_steps)


def run_gradio(ada, args):
    import gradio as gr
    import numpy as np

    def generate(files, prompt, guidance, seed, count):
        images_np = [np.asarray(f) for f in files] if files else None
        embs = ada.generate_adaface_embeddings(images_np=images_np, seed=int(seed))
        if embs is None:
            return []
        return list(ada(prompt, guidance_scale=float(guidance),
                        out_image_count=int(count), seed=int(seed)))

    ui = gr.Interface(
        fn=generate,
        inputs=[gr.Gallery(label="subject photos"), gr.Textbox(value="portrait of a z"),
                gr.Slider(1, 12, value=4), gr.Number(value=42), gr.Slider(1, 8, value=4, step=1)],
        outputs=gr.Gallery(label="generations"),
        title="AdaPrompt-TPU zero-shot face personalization")
    ui.launch(server_port=args.port)


def run_repl(ada, args):
    from adaprompt_tpu.cli.common import save_images
    from adaprompt_tpu.eval.face_eval import list_images
    print("demo REPL — commands: subject <folder> | gen <prompt> | quit")
    seed = 42
    while True:
        try:
            line = input("> ").strip()
        except EOFError:
            break
        if not line or line == "quit":
            break
        if line.startswith("subject "):
            folder = line.split(None, 1)[1]
            embs = ada.generate_adaface_embeddings(image_paths=list_images(folder))
            print("subject loaded" if embs is not None else "no face found")
        elif line.startswith("gen "):
            prompt = line.split(None, 1)[1]
            imgs = ada(prompt, out_image_count=1, seed=seed)
            seed += 1
            print("saved:", save_images(imgs, args.outdir)[-1])
        else:
            print("unknown command")


def main(argv=None):
    args = parse_args(argv)
    ada = build_pipeline(args)
    if args.warmup:
        import time
        t0 = time.perf_counter()
        print("warmup: compiling serving signatures (or replaying the "
              "persistent cache) ...")
        ada.warmup(out_image_counts=(1, 4), num_steps=args.num_steps)
        print(f"warmup done in {time.perf_counter() - t0:.0f}s — first "
              "request serves at steady-state latency")
    try:
        import gradio  # noqa: F401
        run_gradio(ada, args)
    except ImportError:
        print("gradio not installed — falling back to the REPL demo")
        run_repl(ada, args)


if __name__ == "__main__":
    main()
