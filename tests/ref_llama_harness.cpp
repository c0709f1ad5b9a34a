// Test-only harness around the REFERENCE llama runtime (llama.cpp), compiled
// at test time from /root/reference by tests/test_reference_e2e_llama.py.
// Original code: drives the reference C API (llama.h:127-237) to dump
// tokenization, logits, and greedy generations so the TPU stack can be
// compared end-to-end on the identical GGJT file.
//
// Usage mirrors tests/ref_harness.cpp:
//   ref_llama_harness <model.ggjt> tokenize <text_file> <out_ids.bin>
//   ref_llama_harness <model.ggjt> eval <ids.bin> <out_logits.bin> <n_ctx> <n_batch>
//   ref_llama_harness <model.ggjt> generate <ids.bin> <out_ids.bin> <n_ctx> <n_batch> <n_gen>

#include "llama.h"

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

static std::string read_file(const char *path) {
    FILE *f = fopen(path, "rb");
    if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(2); }
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::string s(n, '\0');
    if (fread(&s[0], 1, n, f) != (size_t)n) { exit(2); }
    fclose(f);
    return s;
}

int main(int argc, char **argv) {
    if (argc < 5) {
        fprintf(stderr, "usage: %s <model> tokenize|eval|generate <in> <out> [n_ctx n_batch n_gen]\n", argv[0]);
        return 2;
    }
    const char *model_path = argv[1];
    const std::string cmd = argv[2];
    const char *in_path = argv[3];
    const char *out_path = argv[4];
    int n_ctx = argc > 5 ? atoi(argv[5]) : 256;
    int n_batch = argc > 6 ? atoi(argv[6]) : 32;

    llama_init_backend();
    llama_context_params params = llama_context_default_params();
    params.n_ctx = n_ctx;
    params.n_batch = n_batch;
    params.n_gpu_layers = 0;
    params.seed = 0;
    params.f16_kv = false;
    params.logits_all = true;
    params.vocab_only = (cmd == "tokenize");

    // optional trailing arg: a 'ggla' adapter applied before eval
    // (llama_apply_lora_from_file, llama.h:162). LoRA patches weights IN
    // PLACE, so the model must not be a read-only mmap (the reference CLI
    // also forces use_mmap=false with --lora).
    const char *lora_path = argc > 8 ? argv[8] : NULL;
    params.use_mmap = !(lora_path && *lora_path);

    llama_context *ctx = llama_init_from_file(model_path, params);
    if (!ctx) { fprintf(stderr, "model load failed\n"); return 1; }
    if (lora_path && *lora_path) {
        if (llama_apply_lora_from_file(ctx, lora_path, NULL, 2)) {
            fprintf(stderr, "lora apply failed\n");
            return 1;
        }
    }

    if (cmd == "tokenize") {
        std::string text = read_file(in_path);
        std::vector<llama_token> ids(text.size() + 8);
        int n = llama_tokenize(ctx, text.c_str(), ids.data(), (int)ids.size(), true);
        if (n < 0) { fprintf(stderr, "tokenize overflow (%d)\n", n); return 1; }
        FILE *f = fopen(out_path, "wb");
        fwrite(ids.data(), sizeof(llama_token), n, f);
        fclose(f);
        fprintf(stderr, "tokenized %zu bytes -> %d tokens\n", text.size(), n);
        return 0;
    }

    std::string blob = read_file(in_path);
    const int n_tokens = (int)(blob.size() / sizeof(int32_t));
    std::vector<llama_token> ids(n_tokens);
    memcpy(ids.data(), blob.data(), blob.size());
    const int n_vocab = llama_n_vocab(ctx);

    if (cmd == "eval") {
        FILE *f = fopen(out_path, "wb");
        for (int start = 0; start < n_tokens; start += n_batch) {
            const int bs = n_tokens - start < n_batch ? n_tokens - start : n_batch;
            if (llama_eval(ctx, ids.data() + start, bs, start, 2)) {
                fprintf(stderr, "eval failed at %d\n", start);
                return 1;
            }
            const float *logits = llama_get_logits(ctx);
            fwrite(logits, sizeof(float), (size_t)bs * n_vocab, f);
        }
        fclose(f);
        fprintf(stderr, "eval: %d tokens x %d vocab\n", n_tokens, n_vocab);
        return 0;
    }

    if (cmd == "generate") {
        const int n_gen = argc > 7 ? atoi(argv[7]) : 16;
        int n_past = 0;
        for (int start = 0; start < n_tokens; start += n_batch) {
            const int bs = n_tokens - start < n_batch ? n_tokens - start : n_batch;
            if (llama_eval(ctx, ids.data() + start, bs, n_past, 2)) return 1;
            n_past += bs;
        }
        std::vector<llama_token> out;
        for (int i = 0; i < n_gen; i++) {
            const float *logits = llama_get_logits(ctx);
            const float *row = logits + (size_t)(i == 0 ? (n_tokens - 1) % n_batch
                                                        : 0) * n_vocab;
            llama_token best = 0;
            for (int v = 1; v < n_vocab; v++)
                if (row[v] > row[best]) best = v;
            out.push_back(best);
            if (llama_eval(ctx, &best, 1, n_past, 2)) return 1;
            n_past += 1;
        }
        FILE *f = fopen(out_path, "wb");
        fwrite(out.data(), sizeof(llama_token), out.size(), f);
        fclose(f);
        fprintf(stderr, "generated %d tokens\n", n_gen);
        return 0;
    }

    fprintf(stderr, "unknown command %s\n", cmd.c_str());
    return 2;
}
