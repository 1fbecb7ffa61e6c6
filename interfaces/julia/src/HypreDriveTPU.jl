"""
    HypreDriveTPU

Julia bindings for hypredrive_tpu over its C shim
(`native/libhypredrv_tpu.so`), mirroring the reference's Julia front end
(ref: interfaces/julia/src/HypreDrive.jl:4-10 — dlopen/ccall bindings
with an options-Dict → YAML emitter).

```julia
using SparseArrays, HypreDriveTPU
A = spdiagm(-1 => -ones(99), 0 => 2ones(100), 1 => -ones(99))
x = HypreDriveTPU.solve(A, ones(100);
                        options = Dict("solver" => Dict("pcg" =>
                            Dict("max_iter" => 200)),
                            "preconditioner" => "amg"))
```

Set `ENV["HYPREDRV_TPU_LIB"]` to override the shared-library path and
`ENV["PYTHONPATH"]` so the embedded interpreter finds the
`hypredrive_tpu` package.
"""
module HypreDriveTPU

using Libdl
using SparseArrays

const _default_lib = joinpath(@__DIR__, "..", "..", "..", "native",
                              "libhypredrv_tpu.so")
const _libref = Ref{Ptr{Cvoid}}(C_NULL)
const _libpath = Ref{String}("")

function _lib()
    if _libref[] == C_NULL
        path = get(ENV, "HYPREDRV_TPU_LIB", _default_lib)
        _libpath[] = path
        _libref[] = Libdl.dlopen(path)
    end
    return _libpath[]
end

struct HypreDriveError <: Exception
    code::UInt32
    msg::String
end

function _errmsg()
    p = ccall((:HYPREDRV_ErrorMessage, _lib()), Cstring, ())
    p == C_NULL ? "" : unsafe_string(p)
end

macro check(call)
    quote
        code = $(esc(call))
        code == 0 || throw(HypreDriveError(code, _errmsg()))
    end
end

initialize() = @check ccall((:HYPREDRV_Initialize, _lib()), UInt32, ())
finalize_lib() = @check ccall((:HYPREDRV_Finalize, _lib()), UInt32, ())

function create()
    h = Ref{Int64}(0)
    @check ccall((:HYPREDRV_Create, _lib()), UInt32, (Ref{Int64},), h)
    return h[]
end

destroy(h::Int64) =
    @check ccall((:HYPREDRV_Destroy, _lib()), UInt32, (Ref{Int64},),
                 Ref(h))
set_library_mode(h::Int64) =
    @check ccall((:HYPREDRV_SetLibraryMode, _lib()), UInt32, (Int64,), h)
input_args_parse(h::Int64, yaml::AbstractString) =
    @check ccall((:HYPREDRV_InputArgsParse, _lib()), UInt32,
                 (Int64, Cstring), h, yaml)
precon_create(h::Int64) =
    @check ccall((:HYPREDRV_PreconCreate, _lib()), UInt32, (Int64,), h)
solver_create(h::Int64) =
    @check ccall((:HYPREDRV_LinearSolverCreate, _lib()), UInt32, (Int64,), h)
solver_setup(h::Int64) =
    @check ccall((:HYPREDRV_LinearSolverSetup, _lib()), UInt32, (Int64,), h)
solver_apply(h::Int64) =
    @check ccall((:HYPREDRV_LinearSolverApply, _lib()), UInt32, (Int64,), h)
precon_destroy(h::Int64) =
    @check ccall((:HYPREDRV_PreconDestroy, _lib()), UInt32, (Int64,), h)
solver_destroy(h::Int64) =
    @check ccall((:HYPREDRV_LinearSolverDestroy, _lib()), UInt32,
                 (Int64,), h)

function set_matrix_csr(h::Int64, n::Integer, indptr::Vector{Int64},
                        indices::Vector{Int64}, data::Vector{Float64})
    @check ccall((:HYPREDRV_LinearSystemSetMatrixFromCSR, _lib()), UInt32,
                 (Int64, Int64, Ptr{Int64}, Ptr{Int64}, Ptr{Float64}),
                 h, n, indptr, indices, data)
end

function set_rhs(h::Int64, b::Vector{Float64})
    @check ccall((:HYPREDRV_LinearSystemSetRHSFromArray, _lib()), UInt32,
                 (Int64, Int64, Ptr{Float64}), h, length(b), b)
end

function get_solution(h::Int64, n::Integer)
    x = Vector{Float64}(undef, n)
    @check ccall((:HYPREDRV_LinearSystemGetSolutionValues, _lib()),
                 UInt32, (Int64, Int64, Ptr{Float64}), h, n, x)
    return x
end

solver_iterations(h::Int64) = begin
    it = Ref{Int64}(0)
    @check ccall((:HYPREDRV_LinearSolverGetNumIterations, _lib()),
                 UInt32, (Int64, Ref{Int64}), h, it)
    it[]
end

"""
    options_to_yaml(opts) -> String

Emit the hypredrive YAML configuration for a nested `Dict`
(ref: interfaces/julia/src/HypreDrive.jl:343-445 — same contract).
Scalars, strings, Bools (`on`/`off`) and vectors are supported.
"""
function options_to_yaml(opts::AbstractDict; depth::Int = 0)
    io = IOBuffer()
    if depth == 0 && !haskey(opts, "linear_system")
        println(io, "linear_system:")
    end
    pad = "  "^depth
    for (k, v) in opts
        if v isa AbstractDict
            println(io, pad, k, ":")
            print(io, options_to_yaml(v; depth = depth + 1))
        elseif v isa Bool
            println(io, pad, k, ": ", v ? "on" : "off")
        elseif v isa AbstractVector
            println(io, pad, k, ": [", join(v, ", "), "]")
        else
            println(io, pad, k, ": ", v)
        end
    end
    return String(take!(io))
end

const DEFAULT_YAML = """
linear_system:
solver:
  pcg:
    max_iter: 100
    relative_tol: 1.0e-8
preconditioner: amg
"""

"""
    solve(A::SparseMatrixCSC, b::Vector; options=nothing, yaml=nothing)

One-shot solve of `A x = b`.  `options` is a nested Dict converted via
[`options_to_yaml`](@ref); `yaml` passes raw YAML text.
"""
function solve(A::SparseMatrixCSC{Float64}, b::Vector{Float64};
               options = nothing, yaml = nothing)
    n = size(A, 1)
    size(A, 2) == n || throw(ArgumentError("A must be square"))
    length(b) == n || throw(ArgumentError("length(b) must match A"))
    text = yaml !== nothing ? String(yaml) :
           options !== nothing ? options_to_yaml(options) : DEFAULT_YAML

    # CSC -> CSR (transpose walk; SparseArrays stores CSC)
    At = sparse(transpose(A))          # CSC of Aᵀ == CSR of A
    indptr = Vector{Int64}(At.colptr .- 1)
    indices = Vector{Int64}(At.rowval .- 1)
    data = Vector{Float64}(At.nzval)

    initialize()
    h = create()
    try
        set_library_mode(h)
        input_args_parse(h, text)
        set_matrix_csr(h, n, indptr, indices, data)
        set_rhs(h, b)
        precon_create(h)
        solver_create(h)
        solver_setup(h)
        solver_apply(h)
        return get_solution(h, n)
    finally
        try solver_destroy(h) catch end
        try precon_destroy(h) catch end
        destroy(h)
    end
end

end # module
